"""Shared layer helpers: torch-style explicit padding and BN defaults.

PyTorch pads convolutions symmetrically with an integer; XLA's `SAME` is
asymmetric for stride > 1, which would shift every stride-2 feature map by a
pixel relative to the reference.  `torch_pad` reproduces the reference
geometry exactly so imported reference checkpoints stay numerically faithful.
"""

from __future__ import annotations

import flax.linen as nn
import jax

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax momentum = 1-0.1).
BN_EPS = 1e-5
BN_MOMENTUM = 0.9


def torch_pad(padding):
    """Symmetric per-spatial-dim padding, torch Conv2d(padding=p) style."""
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    return tuple((p, p) for p in padding)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-statistics semantics.

    Differences from `flax.linen.BatchNorm` (both matter for numeric
    parity with reference torch training, test_train_torch_parity.py):

      * two-pass variance E[(x-E[x])^2] (flax's default E[x^2]-E[x]^2
        shortcut suffers catastrophic cancellation whose error depends on
        summation order — under a data-sharded mesh the cross-device
        reduction reassociates and train-mode forwards drifted ~1e-3 in
        logits through the 22 BN layers of I3D);
      * the running variance is updated with the UNBIASED batch variance
        (x n/(n-1)), exactly as torch BatchNorm does, while normalization
        uses the biased one — flax stores the biased variance, so running
        stats drift by n/(n-1) per update vs reference training.

    Variable/param names ("mean"/"var", "scale"/"bias") match flax
    BatchNorm so checkpoints and the torch importers are unaffected.
    Computation is pinned to f32: under bf16 mixed precision the conv
    output is upcast here so batch statistics stay full-precision.
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        feat = x.shape[-1]
        init_mean = lambda: jnp.zeros((feat,), jnp.float32)
        init_var = lambda: jnp.ones((feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", init_mean)
        ra_var = self.variable("batch_stats", "var", init_var)
        scale = self.param("scale", lambda *_: init_var(), (feat,))
        bias = self.param("bias", lambda *_: init_mean(), (feat,))

        # Like flax BatchNorm(dtype=f32): compute AND return in at least
        # f32 (the next conv's dtype= re-selects bf16 under mixed
        # precision); f64 passes through untouched (x64 parity tests).
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def batch_norm(train, name=None, epsilon=BN_EPS):
    return TorchBatchNorm(use_running_average=not train, epsilon=epsilon,
                          momentum=BN_MOMENTUM, name=name)


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
