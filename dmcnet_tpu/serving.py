"""End-to-end video inference: compressed file -> action scores.

The user-facing capstone of the TPU-resident pipeline: the native front-end
streams GOPs (decode once), the device runs back-tracing (Pallas when the
stream qualifies, XLA otherwise), normalization, center crop, the packed DMC
generator, and the classifier — per GOP, scores averaged over sampled
frames, TSN-style.

    predictor = DMCPredictor.from_checkpoint(ckpt, num_class=51)
    scores = predictor.predict_video("video.mp4")   # (num_class,)

The reference needs three processes and two codebases for this path
(coviar C extension per frame + torch test.py + combine scripts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.codec.host_accumulate import gop_mv_residual_u8
from dmcnet_tpu.codec.mpeg4 import VideoReader
from dmcnet_tpu.data.transforms import IMAGENET_STD, MEAN_STD
from dmcnet_tpu.models import DMCNet
from dmcnet_tpu.ops.packed_generator import PackedDenseEstimator


class DMCPredictor:
    """MV-representation DMC-Net inference over whole videos."""

    def __init__(self, params, batch_stats, num_class=51,
                 arch="resnet18", arch_estimator="DenseNetTiny",
                 gen_flow_or_delta=1, mv_minmaxnorm=1, input_size=224,
                 pack=True):
        self.model = DMCNet(num_class=num_class, num_segments=1,
                            arch=arch, arch_estimator=arch_estimator,
                            gen_flow_or_delta=gen_flow_or_delta)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.input_size = input_size
        self.mv_minmaxnorm = mv_minmaxnorm
        self.packed = None
        self.packed_cls = None
        if pack and arch_estimator in ("DenseNet", "DenseNetSmall",
                                       "DenseNetTiny"):
            widths = {"DenseNet": (128, 128, 96, 64, 32),
                      "DenseNetSmall": (32, 32, 24, 16, 8),
                      "DenseNetTiny": (8, 8, 6, 4, 2)}[arch_estimator]
            full = arch == "resnet18"
            self.packed = PackedDenseEstimator(
                params["gen_flow_model"], widths=widths,
                packed_output=full,
                fuse_mv_delta=full and bool(gen_flow_or_delta))
            if arch == "resnet18":
                # whole pipeline stays in the packed layout: 4x4 MXU-tile
                # stem + folded inference BN (ops/packed_resnet.py)
                from dmcnet_tpu.ops.packed_resnet import PackedResNet18

                self.packed_cls = PackedResNet18(
                    {"params": params["base_model"],
                     "batch_stats": batch_stats["base_model"]})
        self.gen_flow_or_delta = gen_flow_or_delta

    @classmethod
    def from_checkpoint(cls, path, num_class=51, **kwargs):
        """Load a framework checkpoint or a reference .pth.tar."""
        from dmcnet_tpu.train.checkpoints import load_checkpoint
        from dmcnet_tpu.train.engine import TrainState, create_train_state

        model = DMCNet(num_class=num_class, num_segments=1,
                       arch=kwargs.get("arch", "resnet18"),
                       arch_estimator=kwargs.get("arch_estimator",
                                                 "DenseNetTiny"),
                       gen_flow_or_delta=kwargs.get("gen_flow_or_delta", 1))
        hw = kwargs.get("input_size", 224)
        mv = jnp.zeros((1, 1, hw, hw, 2))
        res = jnp.zeros((1, 1, hw, hw, 3))
        variables = model.init(jax.random.key(0), mv, res, train=False)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_cls=None, opt_gf=None)
        try:
            state, _ = load_checkpoint(state, path)
        except Exception:
            from dmcnet_tpu.train.checkpoints import load_reference_weights
            params, bstats, _, _ = load_reference_weights(state, None, path)
            state = state.replace(params=params, batch_stats=bstats)
        return cls(state.params, state.batch_stats, num_class=num_class,
                   **kwargs)

    @functools.cached_property
    def _classify(self):
        size = self.input_size
        bound = 20.0 if self.mv_minmaxnorm else None

        del bound  # encoding happens natively (gop_mv_residual_u8)

        @jax.jit
        def fn(mv, res):
            # inputs are the uint8-encoded representation; normalize exactly
            # like the training pipeline (dataset.py:251-263)
            mv = (mv.astype(jnp.float32) / 255.0 - 0.5) / MEAN_STD
            res = (res.astype(jnp.float32) / 255.0 - 0.5) \
                / jnp.asarray(IMAGENET_STD)
            x = jnp.concatenate([mv, res], axis=-1)
            if self.packed_cls is not None:
                # fully packed: +mv already fused into the generator weights
                return self.packed_cls(self.packed(x.astype(jnp.bfloat16)))
            if self.packed is not None:
                dmc = self.packed(x.astype(jnp.bfloat16)).astype(jnp.float32)
                dmc = dmc + mv if self.gen_flow_or_delta else dmc
                logits = self.model.apply(
                    self.variables, dmc, method="classify", train=False)
            else:
                logits, _ = self.model.apply(
                    self.variables, mv[:, None], res[:, None], train=False)
            return logits

        return fn

    def _center_crop(self, arr):
        size = self.input_size
        h, w = arr.shape[1:3]
        y0 = max((h - size) // 2, 0)
        x0 = max((w - size) // 2, 0)
        out = arr[:, y0:y0 + size, x0:x0 + size]
        if out.shape[1] != size or out.shape[2] != size:
            pad = [(0, 0), (0, size - out.shape[1]), (0, size - out.shape[2]),
                   (0, 0)]
            out = np.pad(out, pad)
        return out

    def predict_video(self, path, frames_per_gop=3):
        """Average logits over `frames_per_gop` sampled P-frames per GOP.

        All sampled frames of the video go to the device as ONE batch — one
        dispatch per video instead of one per GOP, which matters when the
        device sits behind an RPC boundary."""
        mvs, ress = [], []
        with VideoReader(path) as reader:
            for g in range(reader.num_gops):
                frames, mv_maps = reader.decode_gop(g)
                if len(frames) < 2:
                    continue
                mv, res = gop_mv_residual_u8(
                    mv_maps, frames, True,
                    20 if self.mv_minmaxnorm else None)
                pick = np.linspace(1, len(frames) - 1,
                                   min(frames_per_gop, len(frames) - 1))
                pick = np.unique(np.round(pick).astype(int))
                mvs.append(self._center_crop(mv[pick]))
                ress.append(self._center_crop(res[pick]))
        if not mvs:
            raise ValueError(f"no usable GOPs in {path}")
        mv = np.concatenate(mvs)
        res = np.concatenate(ress)
        n = len(mv)
        # bucket to multiples of 16 clips so videos of similar length share
        # one compiled executable (padded rows dropped host-side)
        padded = -(-n // 16) * 16
        if padded != n:
            reps = [1] * (n - 1) + [padded - n + 1]
            mv = np.repeat(mv, reps, axis=0)
            res = np.repeat(res, reps, axis=0)
        logits = self._classify(jnp.asarray(mv), jnp.asarray(res))
        return np.asarray(logits)[:n].mean(axis=0)
