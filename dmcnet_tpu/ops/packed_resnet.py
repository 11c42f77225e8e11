"""Packed-stem, BN-folded ResNet-18 serving path.

Two MXU-oriented rewrites of the torchvision-compatible `models.resnet`
backbone (reference TSN classifier, code/dmcnet/model.py:283-327) for the
inference hot path:

1. **Space-to-depth stem.**  The TSN-surgery conv1 is a 7x7 stride-2 conv
   with only 2 input channels — a contraction depth of 7*7*2 = 98 scattered
   over a 224-wide image, leaving most of the 128x128 MXU idle.  In the
   s=2 packed layout (the same one `ops.packed_generator` already produces)
   it becomes an EXACTLY equivalent 4x4 stride-1 conv over s*s*C_in = 8
   channels — contraction 4*4*8 = 128, exactly one MXU lane tile — with
   explicit (2, 1) padding reproducing torch's pad-3 floor-mode geometry:

       y[i] = sum_a w[a] x[2i + a - 3]        (original, stride 2, pad 3)
       x[2u + q] = p[u, q]                    (packed input)
       => y[i] = sum_{du, q} w[2 du + q + 3] p[i + du, q],  du in [-2, 1]

2. **BN folding.**  Inference-mode BatchNorm is an affine map, folded into
   the adjacent conv's weights/bias once at load time:
       w' = w * gamma / sqrt(var + eps),  b' = beta - mean * that.

Both rewrites are exact in f32 (tested vs `models.resnet` bit-for-bit at
tolerance ~1e-4); serving runs them in bf16.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from dmcnet_tpu.models.layers import BN_EPS


def pack_stem_conv(w, s=2):
    """(7, 7, C_in, C_out) stride-2 pad-3 conv -> (4, 4, s*s*C_in, C_out)
    stride-1 conv on the s=2 space-to-depth input (pad (2, 1) per dim).

    Packed input channel layout: (qy*s + qx)*C_in + c (space_to_depth)."""
    kh, kw, c_in, c_out = w.shape
    assert s == 2 and kh == 7 and kw == 7, (s, w.shape)
    wp = np.zeros((4, 4, s * s * c_in, c_out), w.dtype)
    for du in range(-2, 2):
        for dv in range(-2, 2):
            for qy in range(s):
                for qx in range(s):
                    a, b = 2 * du + qy + 3, 2 * dv + qx + 3
                    if 0 <= a < 7 and 0 <= b < 7:
                        q = (qy * s + qx) * c_in
                        wp[du + 2, dv + 2, q:q + c_in, :] = w[a, b]
    return wp


def fold_bn(w, bn_params, bn_stats, eps=BN_EPS):
    """Fold inference BN into the preceding conv: returns (w', b')."""
    gamma = np.asarray(bn_params["scale"], np.float64)
    beta = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    k = gamma / np.sqrt(var + eps)
    return (np.asarray(w, np.float64) * k).astype(np.float32), \
        (beta - mean * k).astype(np.float32)


class PackedResNet18:
    """Inference twin of `models.resnet.resnet18` consuming the s=2 packed
    input layout directly (e.g. the packed generator output + packed mv).

    Build from trained variables ({'params', 'batch_stats'}); call on
    (B, H/2, W/2, 4*C_in) packed NHWC."""

    def __init__(self, variables, stage_sizes=(2, 2, 2, 2), s=2,
                 dtype=jnp.bfloat16):
        p, bs = variables["params"], variables["batch_stats"]
        self.dtype = dtype
        w1, b1 = fold_bn(p["conv1"]["kernel"], p["bn1"], bs["bn1"])
        self.stem = (jnp.asarray(pack_stem_conv(w1, s), dtype),
                     jnp.asarray(b1, dtype))
        self.blocks = []
        for stage, n_blocks in enumerate(stage_sizes):
            for block in range(n_blocks):
                name = f"layer{stage + 1}_{block}"
                bp, bbs = p[name], bs[name]
                stride = 2 if (stage > 0 and block == 0) else 1
                conv1 = fold_bn(bp["conv1"]["kernel"], bp["bn1"], bbs["bn1"])
                conv2 = fold_bn(bp["conv2"]["kernel"], bp["bn2"], bbs["bn2"])
                down = None
                if "downsample_conv" in bp:
                    down = fold_bn(bp["downsample_conv"]["kernel"],
                                   bp["downsample_bn"], bbs["downsample_bn"])
                cast = lambda wb: (jnp.asarray(wb[0], dtype),
                                   jnp.asarray(wb[1], dtype))
                self.blocks.append((stride, cast(conv1), cast(conv2),
                                    cast(down) if down else None))
        self.fc = (jnp.asarray(p["fc"]["kernel"], dtype),
                   jnp.asarray(p["fc"]["bias"], dtype))

    @staticmethod
    def _conv(x, w, b, stride=1, pad=1):
        y = lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    def __call__(self, x_packed):
        x = x_packed.astype(self.dtype)
        w, b = self.stem
        # packed stem: 4x4 stride-1, pad (2, 1) == original 7x7/2 pad 3
        x = lax.conv_general_dilated(
            x, w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jnp.maximum(x, 0)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
        for stride, c1, c2, down in self.blocks:
            identity = x
            y = jnp.maximum(self._conv(x, *c1, stride=stride), 0)
            y = self._conv(y, *c2)
            if down is not None:
                identity = self._conv(x, *down, stride=stride, pad=0)
            x = jnp.maximum(y + identity, 0)
        x = jnp.mean(x, axis=(1, 2))
        wf, bf = self.fc
        return x @ wf + bf
