"""Adversarial discriminators for the GAN variant.

Architectures match /root/reference/code/dmcnet_GAN/model.py:254-438: stacks
of [conv3x3 (stride 2 to downsample, stride 1 to deepen) + LeakyReLU(0.2) +
channel Dropout(0.25) + BatchNorm] ending in a 2-logit linear head
(real/fake as a 2-class problem, trained with cross-entropy).

Note the reference's `nn.BatchNorm2d(out, 0.8)` sets **eps=0.8** (positional
arg), a quirk inherited from the PyTorch-GAN examples; we reproduce it so
imported checkpoints and training dynamics match.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from dmcnet_tpu.models.layers import batch_norm, conv3x3

_D_BN_EPS = 0.8  # reference dmcnet_GAN/model.py:263 — eps, not momentum.


class _DBlock(nn.Module):
    """conv3x3(stride) + LeakyReLU(0.2) + Dropout2d(0.25) [+ BN(eps=0.8)]."""

    features: int
    stride: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        x = conv3x3(self.features, stride=self.stride, name="conv")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        # torch Dropout2d drops whole channels; NHWC -> broadcast over H, W.
        x = nn.Dropout(rate=0.25, broadcast_dims=(1, 2),
                       deterministic=not train, name="drop")(x)
        if self.use_bn:
            x = batch_norm(train, name="bn", epsilon=_D_BN_EPS)(x)
        return x


class _Discriminator(nn.Module):
    """Generic discriminator: `depth` stride-1 blocks follow each stride-2
    downsampling block; `widths` are the per-stage channel counts."""

    widths: Sequence[int] = (16, 32, 64, 128)
    depth: int = 1  # blocks per stage (1 = downsample only)

    @nn.compact
    def __call__(self, x, train=True):
        for s, w in enumerate(self.widths):
            use_bn = s > 0  # first downsample block has no BN (reference :287)
            x = _DBlock(w, stride=2, use_bn=use_bn, name=f"stage{s}_down")(
                x, train=train)
            for i in range(1, self.depth):
                x = _DBlock(w, stride=1, name=f"stage{s}_deep{i}")(
                    x, train=train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(2, name="adv_layer")(x)


class Discriminator(_Discriminator):
    widths: Sequence[int] = (16, 32, 64, 128)
    depth: int = 1


class Discriminator2(_Discriminator):
    widths: Sequence[int] = (16, 32, 64, 128)
    depth: int = 2


class Discriminator3(_Discriminator):
    widths: Sequence[int] = (16, 32, 64, 128)
    depth: int = 3


class Discriminator4(_Discriminator):
    widths: Sequence[int] = (8, 16, 32)
    depth: int = 1


class Discriminator5(_Discriminator):
    widths: Sequence[int] = (16, 32, 64, 128)
    depth: int = 5


_DISCRIMINATORS = {
    "Discriminator": Discriminator,
    "Discriminator2": Discriminator2,
    "Discriminator3": Discriminator3,
    "Discriminator4": Discriminator4,
    "Discriminator5": Discriminator5,
}


def make_discriminator(arch_d):
    try:
        return _DISCRIMINATORS[arch_d]()
    except KeyError:
        raise ValueError(f"unknown arch_d {arch_d!r}") from None
