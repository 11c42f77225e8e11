"""I3D (Inflated Inception-3D) with embedded DMC generator + discriminator.

flax twin of /root/reference/code/dmcnet_I3D/network/i3d.py:458-601 in NDHWC
layout (B, T, H, W, C):

  * Unit3D = conv3d + BN + ReLU with TF-SAME padding (the reference emulates
    TF-SAME in torch via get_padding_shape, i3d.py:299-325; XLA's 'SAME' IS
    TF-SAME, so no emulation needed here);
  * MaxPool SAME with zero padding — equivalent to XLA's -inf padding since
    every pool input is post-ReLU (non-negative);
  * stem 7x7x7/s2 -> pools -> mixed_3b..5c -> AvgPool3d((2,7,7), s1) ->
    conv3d_0c_1x1 (1024->400, bias, no BN) -> dropout -> Linear(400, C)
    (i3d.py:502-560);
  * per-frame DMC generator applied by reshaping (B,T,H,W,C)->(B*T,H,W,C) —
    a free reshape in NDHWC, vs the transpose+reshape the reference needs in
    NCTHW (i3d.py:568-571);
  * `node` multiplexing: 'logit' | 'flow+logit' | 'gen_flow' | 'D'
    (i3d.py:563-601), and `detach` stop-gradient before the stem
    (`--detach`, i3d.py:573-576).

Intended-semantics note (SURVEY.md §2.5 quirk b): the generator consumes the
[mv(2), residual(3)] channels and the MSE target is the flow channels; the
reference's `[:, :5]` slice against a [flow,mv,res] loader order is an
acknowledged inconsistency we do not replicate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from dmcnet_tpu.models.discriminators import make_discriminator
from dmcnet_tpu.models.generators import make_estimator
from dmcnet_tpu.models.layers import batch_norm


class _Conv3DParams(nn.Module):
    """Declares the exact parameter tree of `nn.Conv(name='conv3d')`
    (kernel (kt,kh,kw,I,O) lecun_normal [+ bias zeros]) so the unrolled
    lowering below shares checkpoints with the plain conv3d path."""

    shape: Sequence[int]
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            tuple(self.shape), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.shape[-1],), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class Unit3D(nn.Module):
    """conv3d [+ BN] [+ ReLU] (reference Unit3Dpy, i3d.py:328-403).

    `unroll_time` lowers kt>1, temporal-stride-1 convs as a sum of kt
    temporally-shifted 2D convs on the (B*T, H, W, C) layout — same
    parameters (checkpoint-interchangeable), same TF-SAME zero padding,
    identical math modulo f32 summation order.  Measured on v5e: isolated
    Conv3D ops lag this form up to 2.3x (mixed 3x3x3: 2.77 -> 1.21 ms f32),
    but inside the full jitted I3D graph XLA's layout assignment closes the
    gap completely (backbone fwd 12.4 ms either way; fwd+bwd 35.7 vs 36.8).
    Default off — kept as a tested escape hatch for XLA versions/platforms
    where Conv3D lowers badly in-graph too."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    activation: Optional[str] = "relu"
    use_bias: bool = False
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None  # bf16 = mixed-precision conv
    unroll_time: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        kt, st = self.kernel[0], self.stride[0]
        if self.unroll_time and kt > 1 and st == 1:
            x = self._unrolled(x)
        else:
            x = nn.Conv(self.features, tuple(self.kernel),
                        strides=tuple(self.stride), padding="SAME",
                        use_bias=self.use_bias, dtype=self.dtype,
                        name="conv3d")(x)
        # named residual for remat='dots' (I3D docstring): under that
        # policy the backward keeps ONLY conv outputs and recomputes the
        # BN/ReLU tail, halving stashed-activation traffic per Unit3D.
        # A no-op outside jax.checkpoint.
        x = checkpoint_name(x, "conv_out")
        if self.use_bn:
            x = batch_norm(train, name="batch3d")(x)
        if self.activation == "relu":
            x = nn.relu(x)
        return x

    def _unrolled(self, x):
        kt = self.kernel[0]
        kernel, bias = _Conv3DParams(
            tuple(self.kernel) + (x.shape[-1], self.features),
            self.use_bias, name="conv3d")()
        dt = self.dtype or x.dtype
        # TF-SAME on the stride-1 temporal axis: symmetric zero pad.
        lo = (kt - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, kt - 1 - lo), (0, 0), (0, 0), (0, 0)))
        b, t = x.shape[0], x.shape[1]
        out = None
        for i in range(kt):
            xi = xp[:, i:i + t].reshape((b * t,) + x.shape[2:])
            y = jax.lax.conv_general_dilated(
                xi.astype(dt), kernel[i].astype(dt),
                tuple(self.stride[1:]), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
        if bias is not None:
            out = out + bias.astype(dt)
        return out.reshape((b, t) + out.shape[1:])


def max_pool_same(x, kernel, stride):
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride),
                       padding="SAME")


class Mixed(nn.Module):
    """Inception block: 1x1 / 1x1-3x3 / 1x1-3x3 / pool-1x1 branches
    (reference i3d.py:421-455)."""

    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3]
    dtype: Optional[jnp.dtype] = None
    unroll_time: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        oc, dt, ur = self.out_channels, self.dtype, self.unroll_time
        b0 = Unit3D(oc[0], (1, 1, 1), dtype=dt, name="branch_0")(x, train)
        b1 = Unit3D(oc[1], (1, 1, 1), dtype=dt, name="branch_1a")(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=dt, unroll_time=ur,
                    name="branch_1b")(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), dtype=dt, name="branch_2a")(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=dt, unroll_time=ur,
                    name="branch_2b")(b2, train)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), dtype=dt, name="branch_3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_MIXED_PLAN = {
    "mixed_3b": [64, 96, 128, 16, 32, 32],
    "mixed_3c": [128, 128, 192, 32, 96, 64],
    "mixed_4b": [192, 96, 208, 16, 48, 64],
    "mixed_4c": [160, 112, 224, 24, 64, 64],
    "mixed_4d": [128, 128, 256, 24, 64, 64],
    "mixed_4e": [112, 144, 288, 32, 64, 64],
    "mixed_4f": [256, 160, 320, 32, 128, 128],
    "mixed_5b": [256, 160, 320, 32, 128, 128],
    "mixed_5c": [384, 192, 384, 48, 128, 128],
}


class I3D(nn.Module):
    """Inception-3D classifier with optional embedded DMC generator/GAN."""

    num_classes: int
    modality: str = "rgb"  # rgb | flow | mv | res | I | flow+mp4
    dropout_prob: float = 0.0
    arch_estimator: Optional[str] = None
    arch_d: Optional[str] = None
    remat: object = False  # Mixed-block rematerialization (activation
    # checkpointing) — the TPU realization of the reference's
    # imported-but-unused checkpoint_sequential (i3d.py:19):
    #   True    save nothing, recompute everything (min HBM, max FLOPs);
    #   'dots'  save ONLY conv outputs (checkpoint_name in Unit3D) and
    #           recompute the elementwise BN/ReLU tails in the backward —
    #           the bandwidth-targeted policy: the backward re-reads one
    #           stashed tensor per Unit3D instead of two, trading cheap
    #           VPU recompute for HBM traffic (PERF_NOTES.md §2: the step
    #           is HBM-bound at ~73% of peak).
    dtype: Optional[jnp.dtype] = None  # bf16 = mixed-precision convs
    # (params/BN stats stay f32)
    packed_gen: int = 0  # space-to-depth factor for the dense estimators'
    # exact packed train/eval path (generators._DenseEstimator)
    unroll_time: bool = False  # alternative 3x3x3 lowering as 3 shifted 2D
    # convs (same params/math; see Unit3D docstring — no gain in-graph on
    # current XLA/v5e, kept as a measured escape hatch)

    @property
    def in_channels(self):
        return 2 if self.modality in ("flow", "mv", "flow+mp4") else 3

    def setup(self):
        if self.arch_estimator:
            # remat=True covers the generator too: it runs per-frame at
            # full resolution, so its stashed activations dominate HBM
            # traffic.  remat='dots' targets the BACKBONE's backward
            # traffic only and leaves the generator unrematerialized.
            self.gen_flow_model = make_estimator(self.arch_estimator,
                                                 dtype=self.dtype,
                                                 packed=self.packed_gen,
                                                 remat=self.remat is True)
        if self.arch_d:
            self.discriminator = make_discriminator(self.arch_d)
        self.conv3d_1a_7x7 = Unit3D(64, (7, 7, 7), (2, 2, 2),
                                    dtype=self.dtype)
        self.conv3d_2b_1x1 = Unit3D(64, (1, 1, 1), dtype=self.dtype)
        self.conv3d_2c_3x3 = Unit3D(192, (3, 3, 3), dtype=self.dtype,
                                    unroll_time=self.unroll_time)
        # setup-assigned submodules take their attribute names automatically.
        # With remat, activations inside each Mixed block are recomputed in
        # the backward pass (param names unchanged; 'dots' keeps conv
        # outputs as the only saved residuals).
        if self.remat == "dots":
            policy = jax.checkpoint_policies.save_only_these_names(
                "conv_out")
            mixed = nn.remat(Mixed, static_argnums=(2,), policy=policy)
        elif self.remat:
            mixed = nn.remat(Mixed, static_argnums=(2,))
        else:
            mixed = Mixed
        self.mixed_3b = mixed(_MIXED_PLAN["mixed_3b"], self.dtype,
                               self.unroll_time)
        self.mixed_3c = mixed(_MIXED_PLAN["mixed_3c"], self.dtype,
                               self.unroll_time)
        self.mixed_4b = mixed(_MIXED_PLAN["mixed_4b"], self.dtype,
                               self.unroll_time)
        self.mixed_4c = mixed(_MIXED_PLAN["mixed_4c"], self.dtype,
                               self.unroll_time)
        self.mixed_4d = mixed(_MIXED_PLAN["mixed_4d"], self.dtype,
                               self.unroll_time)
        self.mixed_4e = mixed(_MIXED_PLAN["mixed_4e"], self.dtype,
                               self.unroll_time)
        self.mixed_4f = mixed(_MIXED_PLAN["mixed_4f"], self.dtype,
                               self.unroll_time)
        self.mixed_5b = mixed(_MIXED_PLAN["mixed_5b"], self.dtype,
                               self.unroll_time)
        self.mixed_5c = mixed(_MIXED_PLAN["mixed_5c"], self.dtype,
                               self.unroll_time)
        self.conv3d_0c_1x1 = Unit3D(400, (1, 1, 1), activation=None,
                                    use_bias=True, use_bn=False)
        self.dropout = nn.Dropout(self.dropout_prob)
        self.classifier = nn.Dense(self.num_classes)

    def generate(self, x, train=True):
        """Per-frame DMC generation: (B, T, H, W, 5) -> (B, T, H, W, 2)."""
        b, t = x.shape[0], x.shape[1]
        flat = x.reshape((b * t,) + x.shape[2:])
        # positional `train`: the remat-wrapped estimator declares it a
        # static argument by position (static_argnums).
        gen = self.gen_flow_model(flat, train)
        return gen.reshape((b, t) + gen.shape[1:])

    def discriminate(self, frames, train=True):
        """(N, H, W, 2) -> (N, 2) real/fake logits."""
        return self.discriminator(frames, train=train)

    def features_to_logits(self, x, train=True, rng=None):
        out = self.conv3d_1a_7x7(x, train)
        out = max_pool_same(out, (1, 3, 3), (1, 2, 2))
        out = self.conv3d_2b_1x1(out, train)
        out = self.conv3d_2c_3x3(out, train)
        out = max_pool_same(out, (1, 3, 3), (1, 2, 2))
        out = self.mixed_3b(out, train)
        out = self.mixed_3c(out, train)
        out = max_pool_same(out, (3, 3, 3), (2, 2, 2))
        out = self.mixed_4b(out, train)
        out = self.mixed_4c(out, train)
        out = self.mixed_4d(out, train)
        out = self.mixed_4e(out, train)
        out = self.mixed_4f(out, train)
        out = max_pool_same(out, (2, 2, 2), (2, 2, 2))
        out = self.mixed_5b(out, train)
        out = self.mixed_5c(out, train)
        # AvgPool3d((2, 7, 7), stride 1), VALID (i3d.py:549).  The window is
        # clipped to the actual feature shape so sub-canonical inputs (tiny
        # dryrun/test shapes) stay legal; at the canonical 224x224 / T>=16
        # the window is exactly (2, 7, 7).
        win = (min(2, out.shape[1]), min(7, out.shape[2]),
               min(7, out.shape[3]))
        out = nn.avg_pool(out, win, strides=(1, 1, 1), padding="VALID")
        out = self.conv3d_0c_1x1(out, train)
        # squeeze spatial, mean over time (Unit3Dpy squeeze/mean, i3d.py:398-402)
        out = out.squeeze(axis=(2, 3)).mean(axis=1)
        out = self.dropout(out, deterministic=not train)
        return self.classifier(out)

    def __call__(self, inp, node="logit", detach=False, train=True):
        if node == "D":
            return self.discriminate(inp, train=train)
        if self.arch_estimator:
            inp = self.generate(inp, train=train)
        if node == "gen_flow":
            return inp
        feats_in = jax.lax.stop_gradient(inp) if detach else inp
        logits = self.features_to_logits(feats_in, train=train)
        if node == "flow+logit":
            return logits, inp
        return logits


def init_i3d_variables(model, rng, sample, train=False):
    """Initialize ALL branches (classifier path AND discriminator) in one
    init — flax creates params lazily, unlike the reference's eager torch
    construction, so a plain 'flow+logit' init would miss the D params."""

    def init_fn(mdl):
        out = mdl(sample, "flow+logit" if mdl.arch_estimator else "logit",
                  False, train)
        if mdl.arch_d:
            logits, gen = out
            b, t = gen.shape[0], gen.shape[1]
            mdl.discriminate(gen.reshape((b * t,) + gen.shape[2:]),
                             train=train)
        return out

    return model.init(rng, method=init_fn)


def get_symbol(name, modality="rgb", num_classes=51, arch_estimator=None,
               arch_d=None, dropout_prob=0.0, remat=False, **kwargs):
    """Factory + input config (reference network/symbol_builder.py:12-25 and
    network/config.py:10-27: I3D mean=std=[0.5]^3)."""
    if name.upper() != "I3D":
        raise ValueError(f"unknown network {name!r}")
    net = I3D(num_classes=num_classes, modality=modality,
              dropout_prob=dropout_prob, arch_estimator=arch_estimator,
              arch_d=arch_d, remat=remat,
              dtype=kwargs.get("dtype"),
              packed_gen=kwargs.get("packed_gen", 0))
    input_conf = {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]}
    return net, input_conf
