"""Weight initialization and 2D->3D kernel inflation.

flax twin of /root/reference/code/dmcnet_I3D/network/initializer.py:
  * `xavier(params)` — xavier/glorot init over conv/linear kernels (:14-38);
  * `inflate_2d_kernel(w2d, t)` — I3D-style temporal inflation of a 2D conv
    kernel: repeat over the new time axis and divide by t so activations
    are preserved on temporally constant inputs ('inflation' mode, :62-143);
  * `random_temporal_inflate` — 'random' mode: place the 2D kernel at one
    random temporal slice, zeros elsewhere.
"""

from __future__ import annotations

import jax
import numpy as np


def xavier_init_tree(params, rng=None):
    """Re-initialize every kernel leaf with xavier-uniform, biases to 0."""
    rng = np.random.default_rng(rng)

    def leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        x = np.asarray(x)
        if name == "kernel" and x.ndim >= 2:
            fan_in = int(np.prod(x.shape[:-1]))
            fan_out = int(x.shape[-1])
            limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
            return rng.uniform(-limit, limit, size=x.shape).astype(x.dtype)
        if name == "bias":
            return np.zeros_like(x)
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)


def inflate_2d_kernel(w2d, t, mode="inflation", rng=None):
    """(kh, kw, C_in, C_out) 2D kernel -> (t, kh, kw, C_in, C_out) 3D.

    'inflation': tile over time / t (mean-preserving); 'random': all mass in
    one random temporal slice.
    """
    w2d = np.asarray(w2d)
    if mode == "inflation":
        return np.broadcast_to(w2d[None] / t,
                               (t,) + w2d.shape).copy()
    if mode == "random":
        rng = np.random.default_rng(rng)
        out = np.zeros((t,) + w2d.shape, w2d.dtype)
        out[int(rng.integers(t))] = w2d
        return out
    raise ValueError(f"unknown inflation mode {mode!r}")


def inflate_state_2d_to_3d(imported_2d, target_params, mode="inflation",
                           rng=None):
    """Inflate every 4D conv kernel of an imported 2D tree to match the 5D
    kernels of `target_params` (same nesting); non-kernel leaves copied."""

    def walk(src, dst):
        out = {}
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                out[k] = walk(v, dst[k])
                continue
            tgt = np.asarray(dst[k])
            v = np.asarray(v)
            if k == "kernel" and v.ndim == 4 and tgt.ndim == 5:
                out[k] = inflate_2d_kernel(v, tgt.shape[0], mode, rng)
            elif v.shape == tgt.shape:
                out[k] = v
        return out

    return walk(imported_2d, target_params)
