"""Shared layer helpers: torch-style explicit padding and BN defaults.

PyTorch pads convolutions symmetrically with an integer; XLA's `SAME` is
asymmetric for stride > 1, which would shift every stride-2 feature map by a
pixel relative to the reference.  `torch_pad` reproduces the reference
geometry exactly so imported reference checkpoints stay numerically faithful.
"""

from __future__ import annotations

import flax.linen as nn

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax momentum = 1-0.1).
BN_EPS = 1e-5
BN_MOMENTUM = 0.9


def torch_pad(padding):
    """Symmetric per-spatial-dim padding, torch Conv2d(padding=p) style."""
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    return tuple((p, p) for p in padding)


def batch_norm(train, name=None, epsilon=BN_EPS):
    # dtype pinned to f32: under bf16 mixed precision the conv output is
    # upcast here so batch statistics stay full-precision.
    #
    # use_fast_variance=False: two-pass variance E[(x-E[x])^2], matching
    # torch BatchNorm exactly.  flax's default E[x^2]-E[x]^2 shortcut
    # suffers catastrophic cancellation whose error depends on summation
    # order — under a data-sharded mesh the cross-device reduction
    # reassociates and train-mode forwards drifted ~1e-3 in logits through
    # the 22 BN layers of I3D (10x tighter with the two-pass form).
    import jax.numpy as jnp

    return nn.BatchNorm(use_running_average=not train, epsilon=epsilon,
                        momentum=BN_MOMENTUM, dtype=jnp.float32,
                        use_fast_variance=False, name=name)


def conv3x3(features, stride=1, dilation=1, use_bias=True, name=None,
            dtype=None):
    """3x3 conv with torch-style symmetric padding of `dilation` pixels.

    For stride 1 this equals SAME; for stride 2 it reproduces torch's
    floor-mode geometry ((H + 2*p - 3) // 2 + 1).  `dtype=bfloat16` selects
    mixed precision: params stay f32, the conv computes in bf16.
    """
    return nn.Conv(
        features, (3, 3), strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=torch_pad(dilation), use_bias=use_bias, dtype=dtype,
        name=name)
