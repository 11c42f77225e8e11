"""Flag-compatible command-line entry points (train / test / combine)."""
