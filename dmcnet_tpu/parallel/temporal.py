"""Sequence (temporal-axis) parallelism for long-clip I3D inference.

The reference evaluates I3D on 250-frame clips (test/test.sh
--clip-length 250) on a single GPU; at that length the NDHWC activations of
the early stages dominate memory and latency.  Here the clip's T axis is
sharded across the mesh and the WHOLE network runs as one SPMD program:
XLA's spatial partitioner inserts the halo exchanges every temporal conv /
pool needs (ppermute collectives over ICI), so no per-layer communication
code exists — exactly the recipe SURVEY.md §2.5 prescribes for scaling
clip length.

Numerically exact vs single-device (tested on the 8-device CPU mesh).
The mesh size must divide the clip length T; callers pick the largest
device count that divides T (cli/evaluate_video_i3d.py does this
automatically — e.g. 250-frame reference eval clips shard over 5 of 8
chips).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_time_mesh(devices=None):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("time",))


def make_time_sharded_apply(apply_fn, mesh):
    """jit `apply_fn(variables, clip, *args)` with the clip's axis 1 (T)
    sharded over the mesh and variables replicated."""
    repl = NamedSharding(mesh, P())
    tsh = NamedSharding(mesh, P(None, "time"))

    def wrapped(variables, clip, *args):
        variables = jax.lax.with_sharding_constraint(variables, repl)
        clip = jax.lax.with_sharding_constraint(clip, tsh)
        return apply_fn(variables, clip, *args)

    return jax.jit(wrapped)


def place_time_sharded(variables, clip, mesh):
    """Device_put (replicated variables, T-sharded clip) onto the mesh."""
    return (jax.device_put(variables, NamedSharding(mesh, P())),
            jax.device_put(clip, NamedSharding(mesh, P(None, "time"))))
