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


def flatten_tree(tree):
    """Pytree -> (flat f32 vector, unflatten(vec)->tree).  The unflatten
    slices are static, so XLA sees cheap reshapes of one buffer."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sizes = [int(np.prod(l.shape)) if l.ndim else 1 for l in leaves]
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    vec = jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves]) \
        if leaves else jnp.zeros((0,), jnp.float32)

    def unflatten(v):
        outs = [v[offs[i]:offs[i + 1]].reshape(shapes[i]).astype(dtypes[i])
                for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, outs)

    return vec, unflatten


def make_hetero_pipeline_apply(stage_fns, stage_vars, mesh,
                               n_microbatches=None, axis_name="stage",
                               jit=True, remat=False):
    """GPipe over HETEROGENEOUS stages — real models, where every stage has
    different parameter trees and activation shapes (the homogeneous
    `make_pipeline_apply` requires same-shape stages).

    Mechanics on top of the homogeneous schedule:

    - each stage's variables are FLATTENED to one f32 vector
      (`flatten_tree`), zero-padded to the longest stage and stacked to a
      (n, P) array whose leading axis is sharded over 'stage' — a device
      stores only its own stage's weights;
    - the rotating activation buffer is a flat (B_micro, L) f32 plane with
      L = max over stage boundaries of the flat activation size; each
      device runs `lax.switch(axis_index, branches)` where branch i
      unflattens its params (static slices), reshapes its input slice to
      the stage's true shape, applies `stage_fns[i]`, and re-flattens the
      output into the plane.  All n branches compile per device (SPMD: one
      program), exactly one executes per schedule step;
    - the final stage writes its (flat) output; the caller gets it
      reshaped to `stage_fns[-1]`'s true output shape.

    `stage_fns[i](variables_i, x) -> y` must be shape-static given x's
    stage-input shape; `stage_vars[i]` is its pytree of variables.  The
    stage input/output shapes are DISCOVERED with jax.eval_shape from a
    caller-provided probe: pass `stage_fns` already closed over static
    config, and give the pipeline the global input via the returned
    fn(stacked_vec, x).

    The whole schedule is differentiable (switch/scan/ppermute transpose);
    remat=True recomputes stage activations in the backward.

    Returns (fn, stacked_vec): fn(stacked_vec, x) -> y equals applying the
    stages serially; `stacked_vec` is the (n, P) sharded parameter plane
    (callers keep it to re-place or donate)."""
    n = mesh.shape[axis_name]
    if len(stage_fns) != n:
        raise ValueError(f"{len(stage_fns)} stage fns for a {n}-stage mesh")
    vecs, unflats = [], []
    for sv in stage_vars:
        v, u = flatten_tree(sv)
        vecs.append(v)
        unflats.append(u)
    pmax = max(v.shape[0] for v in vecs)
    stacked = jnp.stack([jnp.pad(v, (0, pmax - v.shape[0])) for v in vecs])
    stacked = jax.device_put(
        stacked, NamedSharding(mesh, P(axis_name)))

    return _build_hetero(stage_fns, unflats, mesh, n, n_microbatches,
                         axis_name, jit, remat), stacked


def _build_hetero(stage_fns, unflats, mesh, n, n_microbatches, axis_name,
                  jit, remat):
    dp = "data" in mesh.shape

    def pipelined(stacked_vec, x):
        m = n_microbatches or n
        b = x.shape[0]
        if b % m:
            raise ValueError(f"batch {b} not divisible by {m} microbatches")
        # per-DEVICE microbatch rows: under a (stage, data) mesh the
        # microbatch batch dim is additionally split over 'data'
        data_size = mesh.shape["data"] if dp else 1
        if (b // m) % data_size:
            raise ValueError(f"microbatch {b // m} not divisible by "
                             f"data={data_size}")
        bm = b // m // data_size
        # discover per-boundary shapes once per trace (static)
        shapes = [x.shape[1:]]
        for i, fn in enumerate(stage_fns):
            probe = jax.eval_shape(
                fn, jax.tree.map(
                    lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype),
                    jax.eval_shape(unflats[i],
                                   jax.ShapeDtypeStruct((stacked_vec.shape[1],),
                                                        jnp.float32))),
                jax.ShapeDtypeStruct((bm,) + shapes[-1], x.dtype))
            shapes.append(probe.shape[1:])
        flat_sizes = [int(np.prod(s)) for s in shapes]
        big = max(flat_sizes)
        out_shape = shapes[-1]

        def branch(i):
            def run(vec, plane):
                variables = unflats[i](vec)
                xin = plane[:, :flat_sizes[i]].reshape((bm,) + shapes[i])
                y = stage_fns[i](variables, xin)
                yf = y.reshape(bm, -1).astype(jnp.float32)
                return jnp.pad(yf, ((0, 0), (0, big - yf.shape[1])))
            return jax.checkpoint(run) if remat else run

        branches = [branch(i) for i in range(n)]
        fwd = [(i, (i + 1) % n) for i in range(n)]

        def per_device(vec, xs):
            vec = jnp.squeeze(vec, 0)
            idx = jax.lax.axis_index(axis_name)
            is_first = idx == 0
            is_last = idx == n - 1

            def body(carry, t):
                buf, outs = carry
                inj = jax.lax.dynamic_index_in_dim(
                    xs, jnp.minimum(t, m - 1), 0, keepdims=False)
                inj = jnp.pad(inj.reshape(bm, -1).astype(jnp.float32),
                              ((0, 0), (0, big - flat_sizes[0])))
                y = jax.lax.switch(idx, branches, vec,
                                   jnp.where(is_first, inj, buf))
                j = t - (n - 1)
                jc = jnp.clip(j, 0, m - 1)
                cur = jax.lax.dynamic_index_in_dim(outs, jc, 0,
                                                   keepdims=False)
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(is_last & (j >= 0), y, cur), jc, 0)
                buf = jax.lax.ppermute(y, axis_name, fwd)
                return (buf, outs), None

            init = (jnp.zeros((bm, big), jnp.float32),
                    jnp.zeros((m, bm, big), jnp.float32))
            (_, outs), _ = jax.lax.scan(body, init, jnp.arange(m + n - 1))
            return jax.lax.psum(jnp.where(is_last, outs, 0), axis_name)

        in_x = P(None, "data") if dp else P()
        out = P(None, "data") if dp else P()
        # global microbatch rows; shard_map splits axis 1 over 'data'
        xs = x.reshape((m, b // m) + x.shape[1:])
        outs = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(axis_name), in_x), out_specs=out,
            check_vma=False)(stacked_vec, xs)
        outs = outs[:, :, :flat_sizes[-1]]
        return outs.reshape((b,) + out_shape)

    return jax.jit(pipelined) if jit else pipelined
