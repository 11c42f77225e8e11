"""Structured training-metrics export (JSON lines).

The reference's observability is stdout prints piped to train.log by the
run scripts (exp_my/*/run.sh tee lines; SURVEY.md §5) — fine for a human,
useless for dashboards.  `--metrics-jsonl PATH` on both trainers appends
one self-describing JSON object per log event alongside the unchanged
reference-format stdout lines, so any collector (BigQuery load, pandas,
jq) can consume a run without parsing the print format.

Multi-host: only process 0 writes (metrics are identical replicas).
Writes are line-buffered appends — a crash loses at most the last line,
and a resumed run keeps appending to the same file.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    """Append-only JSONL writer; None path or non-zero process = no-op."""

    def __init__(self, path=None):
        import jax

        self._f = None
        if path and jax.process_index() == 0:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, kind, **fields):
        if self._f is None:
            return
        record = {"kind": kind, "wall_s": round(time.time() - self._t0, 3)}
        for k, v in fields.items():
            if hasattr(v, "item"):  # numpy / jax scalars
                v = v.item()
            record[k] = v
        self._f.write(json.dumps(record) + "\n")

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None
