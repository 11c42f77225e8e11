"""DMC generator networks (MV + residual -> discriminative motion cue).

Channel plans match the reference generators exactly
(/root/reference/code/dmcnet/model.py:45-250); layout is NHWC and all convs
are stride-1 3x3 so every op is SAME-padded and MXU/VPU friendly.

Families:
  * ContextNetwork(-Att): 7 dilated-conv stages (dilations 1-2-4-8-16-1-1,
    BN + LeakyReLU 0.1), optional 2-channel attention head (model.py:45-104).
  * EstimatorDenseNet{,Small,Tiny}: five dense-concat stages with channel
    plans 128/128/96/64/32, 32/32/24/16/8, 8/8/6/4/2 then a 2-channel flow
    head (model.py:122-194).
  * Tiny early-fusion variants: separate 3x3 stems for MV (2ch) and residual
    (3ch) merged by sum or stack (model.py:197-250).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from dmcnet_tpu.models.layers import batch_norm, conv3x3

_LEAKY_SLOPE = 0.1


class _Conv3x3Params(nn.Module):
    """Parameter twin of a 3x3 `nn.Conv`: declares the identical
    {kernel, bias} leaves (same names, shapes, and initializers) without
    binding them to a layout, so the packed-layout forward below shares one
    parameter tree — and one checkpoint format — with the faithful path."""

    c_in: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class _DilatedStage(nn.Module):
    """conv(3x3, dilated) [+ BN] + LeakyReLU(0.1) (reference conv_dilation)."""

    features: int
    dilation: int = 1
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=True):
        x = conv3x3(self.features, dilation=self.dilation,
                    use_bias=not self.use_bn, dtype=self.dtype,
                    name="conv")(x)
        if self.use_bn:
            x = batch_norm(train, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=_LEAKY_SLOPE)


class ContextNetwork(nn.Module):
    """Dilated-conv generator; dilation plan 1-2-4-8-16-1-1 (or 1-2-4-8-1-1-1
    when generating at reduced resolution, reference model.py:45-67)."""

    batch_norm: bool = True
    gen_flow_ds_factor: int = 0
    dtype: Optional[jnp.dtype] = None

    def _dilations(self) -> Sequence[int]:
        return (1, 2, 4, 8, 1, 1, 1) if self.gen_flow_ds_factor else (
            1, 2, 4, 8, 16, 1, 1)

    @nn.compact
    def __call__(self, x, train=True):
        widths = (32, 128, 128, 96, 64, 32, 2)
        for i, (w, d) in enumerate(zip(widths, self._dilations())):
            x = _DilatedStage(w, d, self.batch_norm, self.dtype,
                              name=f"stage_{i}")(x, train=train)
        return x


class ContextNetworkAtt(nn.Module):
    """ContextNetwork trunk + separate flow and attention heads
    (reference model.py:74-104); attention head ends in ReLU."""

    batch_norm: bool = True
    gen_flow_ds_factor: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=True):
        dils = (1, 2, 4, 8, 1, 1) if self.gen_flow_ds_factor else (
            1, 2, 4, 8, 16, 1)
        widths = (32, 128, 128, 96, 64, 32)
        for i, (w, d) in enumerate(zip(widths, dils)):
            x = _DilatedStage(w, d, self.batch_norm, self.dtype,
                              name=f"stage_{i}")(x, train=train)
        flow = _DilatedStage(2, 1, self.batch_norm, self.dtype,
                             name="predict_flow")(x, train=train)
        att = _DilatedStage(2, 1, self.batch_norm, self.dtype,
                            name="predict_att")(x, train=train)
        return flow, nn.relu(att)


class _DenseEstimator(nn.Module):
    """Dense-connectivity estimator: each stage consumes the concat of all
    previous activations and the input (reference model.py:122-194).

    `packed=s` (s > 1) runs the SAME parameters through the space-to-depth
    packed formulation of `ops/packed_generator.py` — an exact linear
    reparameterization (see that module's docstring) that lifts the MXU lane
    utilization of these tiny-channel convs ~4x.  Because the packing
    transform is applied to the traced weights with jnp ops
    (`pack_conv3x3_jnp`), gradients flow back to the faithful parameter
    tree: training in packed mode is numerically equivalent to the unpacked
    path (bit-exact reduction sets; f32 round-off only) and checkpoints are
    interchangeable.  Inputs whose H/W are not divisible by s fall back to
    the unpacked path."""

    widths: Sequence[int]
    dtype: Optional[jnp.dtype] = None
    packed: int = 0

    @nn.compact
    def __call__(self, x, train=True):
        del train  # no BN in the dense estimators
        s = self.packed
        if s and s > 1 and x.shape[1] % s == 0 and x.shape[2] % s == 0:
            return self._packed(x, s)
        for i, w in enumerate(self.widths):
            y = conv3x3(w, dtype=self.dtype, name=f"conv_{i}")(x)
            y = nn.leaky_relu(y, negative_slope=_LEAKY_SLOPE)
            x = jnp.concatenate([y, x.astype(y.dtype)], axis=-1)
        return conv3x3(2, dtype=self.dtype, name="predict_flow")(x)

    def _packed(self, x, s):
        from dmcnet_tpu.ops.packed_generator import (
            depth_to_space,
            pack_conv3x3_jnp,
            space_to_depth,
        )

        names = [f"conv_{i}" for i in range(len(self.widths))] \
            + ["predict_flow"]
        outs = list(self.widths) + [2]
        segments = [x.shape[-1]]
        h = space_to_depth(x, s)
        for i, name in enumerate(names):
            kernel, bias = _Conv3x3Params(sum(segments), outs[i],
                                          name=name)()
            wp, bp = pack_conv3x3_jnp(kernel, bias, s, segments)
            dt = self.dtype or h.dtype
            y = lax.conv_general_dilated(
                h.astype(dt), wp.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bp.astype(dt)
            if i < len(names) - 1:
                y = nn.leaky_relu(y, negative_slope=_LEAKY_SLOPE)
                h = jnp.concatenate([y, h.astype(y.dtype)], axis=-1)
                segments = [outs[i]] + segments
        return depth_to_space(y, s)


class EstimatorDenseNet(_DenseEstimator):
    widths: Sequence[int] = (128, 128, 96, 64, 32)


class EstimatorDenseNetSmall(_DenseEstimator):
    widths: Sequence[int] = (32, 32, 24, 16, 8)


class EstimatorDenseNetTiny(_DenseEstimator):
    widths: Sequence[int] = (8, 8, 6, 4, 2)


class _EarlyFusionTiny(nn.Module):
    """Tiny estimator with separate MV/residual stems (model.py:197-250)."""

    fusion: str  # 'sum' | 'stack'
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=True):
        del train
        x_mv = nn.leaky_relu(
            conv3x3(8, dtype=self.dtype, name="conv_0_mv")(x[..., :2]),
            negative_slope=_LEAKY_SLOPE)
        x_r = nn.leaky_relu(
            conv3x3(8, dtype=self.dtype, name="conv_0_r")(x[..., 2:]),
            negative_slope=_LEAKY_SLOPE)
        if self.fusion == "sum":
            x = x_mv + x_r
        else:
            x = jnp.concatenate([x_mv, x_r], axis=-1)
        for i, w in enumerate((8, 6, 4, 2), start=1):
            y = conv3x3(w, dtype=self.dtype, name=f"conv_{i}")(x)
            y = nn.leaky_relu(y, negative_slope=_LEAKY_SLOPE)
            x = jnp.concatenate([y, x], axis=-1)
        return conv3x3(2, dtype=self.dtype, name="predict_flow")(x)


class EstimatorDenseNetTinyEarlyFusionSum(_EarlyFusionTiny):
    fusion: str = "sum"


class EstimatorDenseNetTinyEarlyFusionStack(_EarlyFusionTiny):
    fusion: str = "stack"


_ESTIMATORS = {
    "ContextNetwork": ContextNetwork,
    "DenseNet": EstimatorDenseNet,
    "DenseNetSmall": EstimatorDenseNetSmall,
    "DenseNetTiny": EstimatorDenseNetTiny,
    "DenseNetTinyEarlyFusionSum": EstimatorDenseNetTinyEarlyFusionSum,
    "DenseNetTinyEarlyFusionStack": EstimatorDenseNetTinyEarlyFusionStack,
}


def make_estimator(arch_estimator, att=0, gen_flow_ds_factor=0, dtype=None,
                   packed=0, remat=False):
    """Estimator factory matching reference name selection (model.py:311-325).

    `packed`: space-to-depth factor for the dense family's exact packed
    reparameterization (see `_DenseEstimator`); ignored by architectures
    that don't support it.  `remat`: rematerialize the estimator's
    activations in the backward pass (exact; param names unchanged) — the
    generator runs per-frame at full resolution, so its stashed
    activations dominate HBM traffic on long clips."""
    if arch_estimator == "ContextNetwork":
        cls = ContextNetworkAtt if att else ContextNetwork
        if remat:
            cls = nn.remat(cls, static_argnums=(2,))
        return cls(gen_flow_ds_factor=gen_flow_ds_factor, dtype=dtype)
    try:
        cls = _ESTIMATORS[arch_estimator]
    except KeyError:
        raise ValueError(f"unknown arch_estimator {arch_estimator!r}") from None
    if remat:
        cls = nn.remat(cls, static_argnums=(2,))
    if issubclass(cls, _DenseEstimator):
        return cls(dtype=dtype, packed=packed)
    return cls(dtype=dtype)
