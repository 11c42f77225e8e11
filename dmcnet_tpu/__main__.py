"""Top-level command dispatcher: ``python -m dmcnet_tpu <command> ...``.

One entry point over the flag-compatible drivers (the reference spreads
these across three codebases and per-dataset scripts):

    python -m dmcnet_tpu train --data-name hmdb51 ...
    python -m dmcnet_tpu serve --weights ckpt video.mp4
"""

import importlib
import sys

COMMANDS = {
    "train": "dmcnet_tpu.cli.train",
    "test": "dmcnet_tpu.cli.test",
    "combine": "dmcnet_tpu.cli.combine",
    "train-gan": "dmcnet_tpu.cli.train_gan",
    "train-i3d": "dmcnet_tpu.cli.train_i3d",
    "train-hmdb51": "dmcnet_tpu.cli.train_hmdb51",
    "train-ucf101": "dmcnet_tpu.cli.train_ucf101",
    "evaluate-i3d": "dmcnet_tpu.cli.evaluate_video_i3d",
    "serve": "dmcnet_tpu.cli.serve",
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m dmcnet_tpu <command> [args]\n\ncommands:")
        for name in COMMANDS:
            print(f"  {name}")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; choose from "
              f"{', '.join(COMMANDS)}", file=sys.stderr)
        return 2
    # Drivers return domain values (accuracy, scores) for programmatic
    # callers — not exit codes; completing without an exception is success.
    result = importlib.import_module(COMMANDS[cmd]).main(rest)
    return result if isinstance(result, int) else 0


if __name__ == "__main__":
    sys.exit(main())
