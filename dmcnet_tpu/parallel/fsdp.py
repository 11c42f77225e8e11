"""FSDP / ZeRO-3 parameter + optimizer-state sharding over the data axis.

The reference framework has no analogue (DataParallel replicates the model
per GPU, code/dmcnet/train.py:117); on TPU pods the replicated copy of
params + two Adam moment sets is pure HBM waste.  Here every large leaf of
the TrainState (params, BN stats, optimizer moments) is stored sharded over
the same 1-D mesh axis the batch is split on.  Inside the jitted step the
GSPMD partitioner inserts the all-gathers that materialize full weights for
each conv and reduce-scatters the gradients back to the shards — the
standard ZeRO-3 schedule, expressed purely as sharding constraints with no
user-level collectives.

Composes with everything in `mesh.py`: same mesh, same batch placement; only
the state placement and the output constraint differ.  Per-chip state bytes
drop by ~the mesh size (see tests/test_fsdp.py for the exact assertion).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import _batch_spec

# Leaves smaller than this stay replicated: gathering a 64-float BN bias
# costs more in collective latency than the copy costs in HBM.
DEFAULT_MIN_SIZE = 2 ** 14


def largest_divisible_dim(shape, n, skip=()):
    """Index of the largest dim divisible by n (ties → later dim), skipping
    `skip`; -1 if none.  The shared ZeRO-3 placement rule for fsdp_spec and
    tensor.tp_spec — one heuristic, one place."""
    best, best_dim = -1, 0
    for i, d in enumerate(shape):
        if i not in skip and d % n == 0 and d >= best_dim:
            best, best_dim = i, d
    return best


def fsdp_spec(tree, mesh, axis_name="data", min_size=DEFAULT_MIN_SIZE):
    """Per-leaf PartitionSpec tree: shard the largest evenly-divisible dim.

    For conv kernels (HWIO / DHWIO) the largest dim is almost always O (or
    I for the late blocks), so shards stay contiguous over channels; leaves
    with no dim divisible by the axis size — and small leaves — replicate.
    """
    n = mesh.shape[axis_name]

    def spec(x):
        shape = tuple(getattr(x, "shape", ()))
        size = int(np.prod(shape, dtype=np.int64)) if shape else 0
        if not shape or size < min_size:
            return P()
        best = largest_divisible_dim(shape, n)
        if best < 0:
            return P()
        parts = [None] * len(shape)
        parts[best] = axis_name
        return P(*parts)

    return jax.tree.map(spec, tree)


def shard_state_fsdp(state, mesh, axis_name="data",
                     min_size=DEFAULT_MIN_SIZE):
    """Place a TrainState with its large leaves sharded over the mesh.

    Returns (sharded_state, spec_tree); pass the spec tree to
    `make_fsdp_train_step` / `make_fsdp_eval_step`.

    Caution: `device_put` aliases leaves whose placement already matches,
    and the train steps donate their input state — don't reuse `state`
    (or place it a second way) after stepping unless it lives on host
    (see PERF_NOTES.md §4; tests snapshot with jax.tree.map(np.asarray)).
    """
    specs = fsdp_spec(state, mesh, axis_name, min_size)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
    return sharded, specs


def make_fsdp_train_step(step_fn, mesh, state_specs, axis_name="data",
                         batch_axis=0):
    """jit a raw train step with FSDP state + data-sharded batch.

    `step_fn(state, batch, *args) -> (state, metrics)` — the same raw
    (jit=False) step the data-parallel wrapper takes.  The output constraint
    pins the updated state back to its shards, which is what makes GSPMD
    emit reduce-scatter for the gradients instead of a full all-reduce.
    """
    data = NamedSharding(mesh, _batch_spec(axis_name, batch_axis))
    out = jax.tree.map(lambda s: NamedSharding(mesh, s), state_specs)

    def wrapped(state, batch, *args):
        batch = jax.lax.with_sharding_constraint(batch, data)
        state, metrics = step_fn(state, batch, *args)
        return jax.lax.with_sharding_constraint(state, out), metrics

    return jax.jit(wrapped, donate_argnums=(0,))


def make_fsdp_eval_step(eval_fn, mesh, state_specs, axis_name="data",
                        batch_axis=0, replicate_out=False):
    """jit an eval step against FSDP-sharded state (no donation).

    Weights are all-gathered on use; `replicate_out=True` additionally
    gathers the outputs onto every device (score dumps need full rows).
    """
    data = NamedSharding(mesh, _batch_spec(axis_name, batch_axis))
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), state_specs)

    def wrapped(state, batch):
        state = jax.lax.with_sharding_constraint(state, sh)
        batch = jax.lax.with_sharding_constraint(batch, data)
        return eval_fn(state, batch)

    if replicate_out:
        return jax.jit(wrapped, out_shardings=NamedSharding(mesh, P()))
    return jax.jit(wrapped)


def gather_state(state):
    """Materialize a (possibly sharded) state as host numpy — for msgpack
    checkpoints, which store the full tree."""
    return jax.tree.map(lambda x: np.asarray(x), state)
