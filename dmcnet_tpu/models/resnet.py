"""ResNet classifier backbone (torchvision-compatible structure, NHWC).

The reference uses torchvision's pretrained ResNet-18/152 with two TSN
surgeries (code/dmcnet/model.py:283-299): `conv1` swapped for a
2*new_length-channel input conv when classifying MV/flow, and `fc` replaced
by a num_class head.  This implementation reproduces the torchvision
BasicBlock graph exactly (including floor-mode stride-2 geometry) so the
released `.pth` weights can be imported tensor-for-tensor, while running in
NHWC with fused XLA convs on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from dmcnet_tpu.models.layers import batch_norm, torch_pad


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + identity/downsample."""

    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None  # bf16 = mixed precision convs

    @nn.compact
    def __call__(self, x, train=True):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=torch_pad(1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = batch_norm(train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=torch_pad(1),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(train, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = batch_norm(train, name="downsample_bn")(identity)
        return nn.relu(y + identity)


# The stem/stage/head graph pieces are module-level functions so the
# pipeline stage split (parallel/pp_resnet.py) runs the SAME code as
# `ResNet.__call__` — a geometry or BN change here reaches both paths.

def make_stem_conv(dtype=None, name="conv1"):
    """The torchvision 7x7/s2 input conv (pre-TSN-surgery geometry)."""
    return nn.Conv(64, (7, 7), strides=(2, 2), padding=torch_pad(3),
                   use_bias=False, dtype=dtype, name=name)


def forward_stem(x, conv1, bn1):
    """conv7x7/s2 -> BN -> ReLU -> torch MaxPool2d(3, 2, padding=1)
    (floor mode, via -inf pad + VALID pool)."""
    x = nn.relu(bn1(conv1(x)))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def block_stride(stage, block):
    """torchvision rule: first block of every non-first stage strides 2."""
    return 2 if (stage > 0 and block == 0) else 1


def block_name(stage, block):
    return f"layer{stage + 1}_{block}"


def forward_head(x, fc):
    """Adaptive avg pool to 1x1 + classifier."""
    return fc(jnp.mean(x, axis=(1, 2)))


class ResNet(nn.Module):
    """ResNet-18/34 family (BasicBlock); returns logits.

    Args mirror the TSN surgeries: `in_channels` (2*new_length for MV/flow,
    3 for iframe/residual) and `num_classes`.
    """

    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    in_channels: int = 3  # informational; inferred from input at init
    dtype: Optional[jnp.dtype] = None  # bf16 = mixed precision (params f32)

    @nn.compact
    def __call__(self, x, train=True):
        x = forward_stem(x, make_stem_conv(self.dtype),
                         batch_norm(train, name="bn1"))
        for stage, (n_blocks, w) in enumerate(
                zip(self.stage_sizes, self.widths)):
            for block in range(n_blocks):
                x = BasicBlock(w, block_stride(stage, block), self.dtype,
                               name=block_name(stage, block))(x, train)
        return forward_head(x, nn.Dense(self.num_classes, name="fc"))


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), widths=(64, 128, 256, 512))
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), widths=(64, 128, 256, 512))
