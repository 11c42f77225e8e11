"""DMCNet: generator + TSN classifier (+ optional discriminator) in one module.

The flax counterpart of the reference `Model`
(/root/reference/code/dmcnet/model.py:253-357 and
/root/reference/code/dmcnet_GAN/model.py:442-566):

  * flattens (B, S, H, W, C) segment stacks to (B*S, H, W, C),
  * optionally average-pool-downsamples the generator input
    (`gen_flow_ds_factor`, model.py:326-327,335-337),
  * runs the DMC generator on concat(MV, residual),
  * `gen_flow_or_delta`: adds the MV back so the generator predicts a delta
    (model.py:345-346),
  * tiles the low-res cue back up when downsampled — the reference uses
    torch `.repeat`, which TILES the map, not nearest-upsampling; reproduced
    with `jnp.tile` (model.py:348),
  * classifies the cue with the backbone; `detach_classifier` selects the
    no-GAN semantics (stop_gradient before the backbone, model.py:352) vs
    the GAN semantics (gradient flows, dmcnet_GAN/model.py:560),
  * with a discriminator and a real-flow input, scores fake‖real stacked on
    the batch axis like the reference (dmcnet_GAN/model.py:553-561).

The unused-by-forward `data_bn` layers of the reference (created at
model.py:295-299 but never applied in forward) are intentionally omitted;
the checkpoint importer tolerates them.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmcnet_tpu.models.discriminators import make_discriminator
from dmcnet_tpu.models.generators import make_estimator
from dmcnet_tpu.models.resnet import resnet18, resnet34


def _make_backbone(arch, num_classes, dtype=None):
    if arch == "resnet18":
        return resnet18(num_classes=num_classes, dtype=dtype)
    if arch == "resnet34":
        return resnet34(num_classes=num_classes, dtype=dtype)
    raise ValueError(f"unsupported base model {arch!r}")


def _flatten_segments(x):
    """(B, S, H, W, C) or (B, H, W, C) -> (B*S, H, W, C)."""
    return x.reshape((-1,) + x.shape[-3:])


def segment_consensus(logits, num_segments):
    """TSN consensus: mean of per-segment logits (reference train.py:239-241)."""
    return jnp.mean(
        logits.reshape((-1, num_segments) + logits.shape[1:]), axis=1)


class PlainTSN(nn.Module):
    """Plain CoViAR-style TSN: the backbone classifies the modality input
    DIRECTLY (no DMC generator).

    The reference dmc-net repo has no such scorer — its released
    iframe/mv/residual score artifacts (exp_my/hmdb51_coviar) come from
    CoViAR-trained TSN models, and its own test.py routes every
    representation through the generator (test.py:72-78), which cannot
    load a 3-channel CoViAR iframe checkpoint.  This module closes that
    gap: `cli/test.py --plain 1` scores the plain modalities with the same
    25-seg/10-crop protocol, and `base_model.*` checkpoint keys line up
    with the reference `.pth.tar` layout (import/export round-trips)."""

    num_class: int
    arch: str = "resnet18"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.base_model = _make_backbone(self.arch, self.num_class,
                                         dtype=self.dtype)

    def __call__(self, x, train=True):
        return self.base_model(_flatten_segments(x), train=train)


class DMCNet(nn.Module):
    """Full DMC-Net model; `__call__` mirrors reference `Model.forward`."""

    num_class: int
    num_segments: int = 3
    representation: str = "mv"
    arch: str = "resnet18"  # reference `base_model` ctor arg
    new_length: int = 1
    gen_flow_or_delta: int = 0
    gen_flow_ds_factor: int = 0
    arch_estimator: str = "ContextNetwork"
    arch_d: Optional[str] = None
    att: int = 0
    detach_classifier: bool = True  # False for the GAN variant
    dtype: Optional[jnp.dtype] = None  # bf16 = mixed-precision training:
    # params/BN stats/losses stay f32, convs compute on the MXU in bf16
    packed_gen: int = 0  # space-to-depth factor for the dense estimators'
    # exact packed train/eval path (generators._DenseEstimator)

    def setup(self):
        self.gen_flow_model = make_estimator(
            self.arch_estimator, self.att, self.gen_flow_ds_factor,
            dtype=self.dtype, packed=self.packed_gen)
        self.base_model = _make_backbone(self.arch, self.num_class,
                                         dtype=self.dtype)
        if self.arch_d:
            self.discriminator = make_discriminator(self.arch_d)

    def generate(self, input_mv, input_residual, train=True):
        """Run the generator; returns (gen_flow[, att_flow])."""
        input_mv = _flatten_segments(input_mv)
        input_residual = _flatten_segments(input_residual)
        if self.gen_flow_ds_factor:
            f = self.gen_flow_ds_factor
            input_mv = nn.avg_pool(input_mv, (f, f), strides=(f, f))
            input_residual = nn.avg_pool(input_residual, (f, f),
                                         strides=(f, f))
        x = jnp.concatenate([input_mv, input_residual], axis=-1)
        out = self.gen_flow_model(x, train=train)
        att_flow = None
        if self.att:
            gen_flow, att_flow = out
        else:
            gen_flow = out
        if self.gen_flow_or_delta == 1:
            gen_flow = gen_flow + input_mv
        if self.gen_flow_ds_factor:
            f = self.gen_flow_ds_factor
            gen_flow = jnp.tile(gen_flow, (1, f, f, 1))
        return (gen_flow, att_flow) if self.att else gen_flow

    def classify(self, gen_flow, train=True):
        inp = jax.lax.stop_gradient(gen_flow) if self.detach_classifier \
            else gen_flow
        return self.base_model(inp, train=train)

    def discriminate(self, flow, train=True):
        return self.discriminator(flow, train=train)

    def __call__(self, input_mv, input_residual, input_flow=None, train=True):
        """Returns (logits, gen_flow[, validity][, att_flow]) like the
        reference forward (model.py:330-357, dmcnet_GAN/model.py:533-566)."""
        out = self.generate(input_mv, input_residual, train=train)
        att_flow = None
        if self.att:
            gen_flow, att_flow = out
        else:
            gen_flow = out
        logits = self.classify(gen_flow, train=train)
        result = [logits, gen_flow]
        if self.arch_d:
            if input_flow is not None:
                d_in = jnp.concatenate(
                    [gen_flow, _flatten_segments(input_flow)], axis=0)
            else:
                d_in = gen_flow
            result.append(self.discriminate(d_in, train=train))
        if self.att:
            result.append(att_flow)
        return tuple(result)
