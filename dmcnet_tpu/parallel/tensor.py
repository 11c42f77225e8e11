"""Tensor (model) parallelism over a 2-D (data, model) mesh.

The reference has no analogue — its only parallelism replicates the whole
model per GPU (code/dmcnet/train.py:117).  On TPU slices the natural second
axis is Megatron-style channel sharding: every conv / dense kernel is split
along its output-channel dim across the 'model' axis, so each chip holds and
computes 1/n of every layer's filters, while the batch is still split along
'data'.  The specs are placement only — the GSPMD partitioner derives the
activation shardings and inserts the all-gathers / reduce-scatters over ICI;
numerics are identical to single-device.

This composes orthogonally with the rest of `parallel/`:

- `make_mesh_2d(data=4, model=2)` → a Mesh with named axes (data, model);
- `tp_spec` shards kernels' O dim on 'model' (optionally also a second dim
  on 'data' — ZeRO-3 within each model shard, see [[fsdp]]);
- the jitted step wrappers are shared with FSDP (`make_fsdp_train_step` /
  `make_fsdp_eval_step` with the 2-D mesh and these specs): batch on
  'data', state pinned to its shards on output.

Use when the model's optimizer state per chip is the constraint (GAN I3D
carries 3 moment sets) or when scaling batch alone stops helping.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_MIN_SIZE = 2 ** 14


def make_mesh_2d(data=None, model=2, devices=None):
    """(data, model) mesh; `data=None` = all remaining devices.

    Adjacent device ids land on the 'model' axis (the inner, most-traffic
    axis) so channel all-gathers ride the shortest ICI hops.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"{data}x{model} mesh over {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def tp_spec(tree, mesh, min_size=DEFAULT_MIN_SIZE, with_fsdp=False):
    """Per-leaf PartitionSpec: kernels' last (output-channel) dim on 'model'.

    Conv kernels (HWIO / DHWIO) and Dense kernels (IO) both carry O last in
    flax, so `P(..., 'model')` is column parallelism for every layer at
    once.  Small leaves (biases, BN) and leaves whose O dim is not divisible
    replicate.  `with_fsdp=True` additionally shards the largest remaining
    divisible dim over 'data' (ZeRO-3 within each model shard).
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]

    def spec(x):
        shape = tuple(getattr(x, "shape", ()))
        size = int(np.prod(shape, dtype=np.int64)) if shape else 0
        if not shape or size < min_size:
            return P()
        parts = [None] * len(shape)
        if len(shape) >= 2 and shape[-1] % n_model == 0:
            parts[-1] = "model"
        if with_fsdp:
            from .fsdp import largest_divisible_dim
            skip = tuple(i for i, p in enumerate(parts) if p is not None)
            best = largest_divisible_dim(shape, n_data, skip=skip)
            if best >= 0:
                parts[best] = "data"
        if all(p is None for p in parts):
            return P()
        return P(*parts)

    return jax.tree.map(spec, tree)


def shard_state_tp(state, mesh, min_size=DEFAULT_MIN_SIZE, with_fsdp=False):
    """Place a TrainState channel-sharded over 'model' (and optionally
    ZeRO-3 over 'data').  Returns (sharded_state, spec_tree) — pass the
    specs to `make_fsdp_train_step(step, mesh, specs)` (the step wrappers
    are sharding-tree-generic and shared with FSDP).  Same aliasing
    caution as `shard_state_fsdp`: donated steps delete buffers this may
    share with `state`."""
    specs = tp_spec(state, mesh, min_size, with_fsdp)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
    return sharded, specs
