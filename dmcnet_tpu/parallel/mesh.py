"""Mesh + sharding plumbing: the TPU-native replacement for DataParallel.

The reference replicates the model per GPU and scatters batches with
`torch.nn.DataParallel` (code/dmcnet/train.py:117) and carries a vestigial
DistributedDataParallel path (code/dmcnet_I3D/train_model.py:117-120).  Here
a single jitted program spans the whole `jax.sharding.Mesh`: the batch is
sharded over the 'data' axis, parameters/optimizer state are replicated, and
XLA emits the gradient all-reduce over ICI — no user-level collectives.

Multi-host: the same program works after `jax.distributed.initialize()`;
each host feeds its local shard of the global batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _batch_spec(axis_name, batch_axis):
    """PartitionSpec splitting `batch_axis` over the mesh axis."""
    return P(*([None] * batch_axis + [axis_name]))


def shard_batch(batch, mesh, axis_name="data", batch_axis=0):
    """Place a host batch with `batch_axis` split across the mesh.

    `batch_axis=1` fits the I3D engine's stacked microbatch layout
    (iter_size, B, ...): the microbatch axis is scanned per-device while B
    is sharded — the reference scatters B the same way via DataParallel
    (code/dmcnet_I3D/train_model.py:117-120)."""
    sharding = NamedSharding(mesh, _batch_spec(axis_name, batch_axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state, mesh):
    """Replicate params/optimizer state on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def make_sharded_train_step(step_fn, mesh, axis_name="data", batch_axis=0):
    """Constrain a train step to (replicated state, data-sharded batch).

    `step_fn(state, batch, *args) -> (state, metrics)`.  jit with explicit
    shardings keeps the state resident and replicated; the psum over
    gradients is inserted by the partitioner.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, _batch_spec(axis_name, batch_axis))

    def wrapped(state, batch, *args):
        batch = jax.lax.with_sharding_constraint(
            batch, data)
        state, metrics = step_fn(state, batch, *args)
        return jax.lax.with_sharding_constraint(state, repl), metrics

    return jax.jit(wrapped, donate_argnums=(0,))


def make_sharded_chunked_steps(fns, mesh, axis_name="data", batch_axis=1):
    """Mesh-wrap engine_i3d.make_i3d_chunked_steps(..., jit=False) output.

    `fns` = (d_accum, d_apply, g_accum, g_apply).  State and the carried
    (grad sums, batch_stats, rng, metric sums) accumulator stay replicated;
    each chunk is sharded on its batch axis (axis 1 of the (C, B, ...)
    stacked layout), so the partitioner inserts ONE gradient all-reduce
    per accum call over ICI.  accum donates the chunk and the inbound
    carry; apply donates state and carry (the monolithic wrapper's
    donation contract, make_sharded_train_step)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, _batch_spec(axis_name, batch_axis))

    def wrap_accum(fn):
        def w(state, chunk, rng, carry, drop):
            chunk = jax.lax.with_sharding_constraint(chunk, data)
            return jax.lax.with_sharding_constraint(
                fn(state, chunk, rng, carry, drop), repl)

        return jax.jit(w, donate_argnums=(1, 3))

    def wrap_apply(fn):
        def w(state, carry, *lrs):
            st, metrics = fn(state, carry, *lrs)
            return jax.lax.with_sharding_constraint(st, repl), metrics

        return jax.jit(w, donate_argnums=(0, 1))

    d_accum, d_apply, g_accum, g_apply = fns
    return (wrap_accum(d_accum), wrap_apply(d_apply),
            wrap_accum(g_accum), wrap_apply(g_apply))


def make_sharded_eval_step(eval_fn, mesh, axis_name="data", batch_axis=0,
                           replicate_out=False):
    """Constrain an eval step to (replicated state, data-sharded batch).

    Unlike the train wrapper, no donation: callers reuse the state across
    eval batches.  Required in multi-host runs, where the replicated state
    spans every process and a plain local jit would reject it.

    `replicate_out=True` all-gathers the outputs onto every device so each
    process can read full per-row results (e.g. logits for score dumps)
    with `np.asarray` — without it, array outputs stay batch-sharded and
    are not fully addressable from any single process."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, _batch_spec(axis_name, batch_axis))

    def wrapped(state, batch):
        state = jax.lax.with_sharding_constraint(state, repl)
        batch = jax.lax.with_sharding_constraint(batch, data)
        return eval_fn(state, batch)

    if replicate_out:
        return jax.jit(wrapped, out_shardings=repl)
    return jax.jit(wrapped)
