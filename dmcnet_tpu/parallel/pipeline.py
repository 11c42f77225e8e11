"""GPipe pipeline parallelism over a 'stage' mesh axis.

The reference has no analogue (its only parallelism replicates the whole
model per GPU, code/dmcnet/train.py:117), and none of its models NEED
pipelining — they are shallow CNNs where data/tensor/FSDP/sequence
parallelism (the rest of `parallel/`) are the right axes.  This module is
the remaining building block for when a model variant outgrows them: N
homogeneous stages live on N devices, microbatches stream through, and the
inter-stage hop is one `ppermute` over ICI per schedule step.

Mechanics (classic GPipe on an SPMD mesh):

- `stack_stage_params([p0, .., p{n-1}])` stacks the per-stage param trees
  along a new leading axis; `shard_stage_params` pins that axis to the
  'stage' mesh axis so each device holds exactly its stage's weights.
- `make_pipeline_apply(stage_fn, mesh, m)` returns a jitted
  `fn(stacked_params, x)` == the serial composition
  `stage_{n-1}(..stage_0(x))`, computed as a `shard_map` program: a
  `lax.scan` over the m + n - 1 schedule steps where every device applies
  its stage to its current activation and the activations rotate one hop
  forward via `lax.ppermute`.  Stage 0 injects microbatch t at step t; the
  last stage emits microbatch t at step t + n - 1.
- The whole schedule is differentiable (scan/ppermute/psum transpose
  cleanly), so `jax.grad` of a loss through `make_pipeline_apply` IS
  pipeline-parallel training — the backward pass replays the schedule in
  reverse with the same per-hop communication (tested bit-close against
  the serial model in tests/test_pipeline_parallel.py).

Requirements, by construction of the rotating buffer: every stage maps
activations to the SAME shape/dtype (pad channels to a common width to
pipeline heterogeneous blocks), and the microbatch count m must divide the
batch.  Bubble fraction is (n-1)/(m+n-1) — pick m >= n.

Composes with data parallelism: `make_stage_mesh(data=k)` builds a 2-D
(stage, data) mesh where each stage is replicated k ways and the
microbatches' batch dim splits over 'data'; the gradient psum over 'data'
falls out of the shard_map transpose (tested == serial).

The input batch is fed replicated (every device holds the microbatches;
stage 0 reads, others ignore) — one H2D broadcast instead of per-step
host scatters, the right trade at the GOP/clip batch sizes this framework
runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_stage_mesh(devices=None, axis_name="stage", data=1):
    """Pipeline mesh; one stage per device row.  `data > 1` adds a second
    'data' axis (pp x dp: each stage is replicated `data` ways and the
    microbatches' batch dim is split across them).  Adjacent device ids
    land on 'data' (the inner axis) so the per-hop stage transfers ride
    longer hops only once per schedule step while the (absent) intra-stage
    traffic would have used the short ones."""
    if devices is None:
        devices = jax.devices()
    if data == 1:
        return Mesh(np.asarray(devices), (axis_name,))
    n = len(devices)
    if n % data:
        raise ValueError(f"{n} devices not divisible by data={data}")
    grid = np.asarray(devices).reshape(n // data, data)
    return Mesh(grid, (axis_name, "data"))


def stack_stage_params(params_list):
    """Stack n per-stage param trees (identical structure) along a new
    leading stage axis — leaf i of the result is `stack([leaf_i of each
    stage])` with shape (n, ...)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *params_list)


def unstack_stage_params(stacked, n):
    """Inverse of `stack_stage_params` (host-side; returns n trees)."""
    return [jax.tree.map(lambda l: np.asarray(l)[i], stacked)
            for i in range(n)]


def shard_stage_params(stacked, mesh, axis_name="stage"):
    """Pin the stacked params' leading stage axis to the mesh: each device
    stores only its own stage's weights (pipeline parallelism IS model
    sharding — per-device param bytes drop by the stage count)."""
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda l: jax.device_put(l, sh), stacked)


def make_pipeline_apply(stage_fn, mesh, n_microbatches=None,
                        axis_name="stage", jit=True, remat=False):
    """Build `fn(stacked_params, x) -> y` running the GPipe schedule.

    `stage_fn(params, x) -> y` is one stage (y.shape == x.shape); the
    returned fn equals applying the n stages serially to the full batch.
    `n_microbatches` (default: the stage count) must divide the batch.
    `remat=True` wraps the stage in `jax.checkpoint` so the backward pass
    recomputes per-(step, stage) activations instead of keeping all
    m x n of them live — the standard GPipe memory trade.
    """
    n = mesh.shape[axis_name]
    if remat:
        stage_fn = jax.checkpoint(stage_fn)
    fwd = [(i, (i + 1) % n) for i in range(n)]

    def per_device(params, xs):
        # params leaves arrive (1, ...) — this device's stage only.
        params = jax.tree.map(lambda l: jnp.squeeze(l, 0), params)
        idx = jax.lax.axis_index(axis_name)
        m = xs.shape[0]
        is_first = idx == 0
        is_last = idx == n - 1

        def body(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t (clamped: past the last
            # microbatch it re-feeds m-1 into the drain bubble, discarded)
            inj = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, m - 1), 0, keepdims=False)
            y = stage_fn(params, jnp.where(is_first, inj, buf))
            # the last stage owns microbatch t-(n-1)'s final activation
            j = t - (n - 1)
            jc = jnp.clip(j, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, jc, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(is_last & (j >= 0), y, cur), jc, 0)
            # rotate every stage's activation one hop forward over ICI
            buf = jax.lax.ppermute(y, axis_name, fwd)
            return (buf, outs), None

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, outs), _ = jax.lax.scan(body, init, jnp.arange(m + n - 1))
        # replicate the result off the last stage (one all-reduce; the
        # other devices contribute zeros)
        return jax.lax.psum(jnp.where(is_last, outs, 0), axis_name)

    # pp x dp: on a 2-D (stage, data) mesh the microbatches' batch dim is
    # additionally split over 'data' — each stage replica pipelines its own
    # batch shard; gradients reduce over 'data' outside (jax.grad emits the
    # psum through the shard_map transpose as usual).
    dp = "data" in mesh.shape
    in_x = P(None, "data") if dp else P()
    out = P(None, "data") if dp else P()

    def pipelined(stacked_params, x):
        m = n_microbatches or n
        b = x.shape[0]
        if b % m:
            raise ValueError(f"batch {b} not divisible by {m} microbatches")
        xs = x.reshape((m, b // m) + x.shape[1:])
        outs = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(axis_name), in_x), out_specs=out,
            check_vma=False)(stacked_params, xs)
        return outs.reshape((b,) + outs.shape[2:])

    return jax.jit(pipelined) if jit else pipelined
