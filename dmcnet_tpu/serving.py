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
from dmcnet_tpu.codec.mpeg4 import shared_reader_cache
from dmcnet_tpu.data.transforms import IMAGENET_STD, MEAN_STD
from dmcnet_tpu.models import DMCNet
from dmcnet_tpu.ops.packed_generator import PackedDenseEstimator


def _cached_reader(path):
    """Open `path` through the process-wide shared `ReaderCache` (one
    budget, one eviction policy across datasets, the coviar shim and
    serving).  Returns a non-closing context manager: the cache owns the
    reader's lifetime, so repeated `predict_video` calls on one path reuse
    the demux instead of re-parsing the file per call."""
    import contextlib
    return contextlib.nullcontext(shared_reader_cache().get(path))


class DMCPredictor:
    """MV-representation DMC-Net inference over whole videos."""

    def __init__(self, params, batch_stats, num_class=51,
                 arch="resnet18", arch_estimator="DenseNetTiny",
                 gen_flow_or_delta=1, mv_minmaxnorm=1, input_size=224,
                 pack=True, mesh=None, backtrace_impl=None):
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
            # fully packed path: the u8 normalize (x/255 - 0.5)/std is a
            # per-channel affine — folded into the conv weights
            # (ops/packed_generator.py input_affine), so _forward_u8 feeds
            # raw u8 (exact in bf16) with zero normalize ops on device
            affine = None
            if full:
                a = np.concatenate([[1.0 / (255.0 * MEAN_STD)] * 2,
                                    1.0 / (255.0 * IMAGENET_STD)])
                b = np.concatenate([[-0.5 / MEAN_STD] * 2,
                                    -0.5 / IMAGENET_STD])
                affine = (a, b)
            self.packed = PackedDenseEstimator(
                params["gen_flow_model"], widths=widths,
                packed_output=full,
                fuse_mv_delta=full and bool(gen_flow_or_delta),
                input_affine=affine)
            if arch == "resnet18":
                # whole pipeline stays in the packed layout: 4x4 MXU-tile
                # stem + folded inference BN (ops/packed_resnet.py)
                from dmcnet_tpu.ops.packed_resnet import PackedResNet18

                self.packed_cls = PackedResNet18(
                    {"params": params["base_model"],
                     "batch_stats": batch_stats["base_model"]})
        self.gen_flow_or_delta = gen_flow_or_delta
        # Optional 1-D jax.sharding.Mesh: serving scale-out. Clip batches
        # (host path) and GOP batches (device-backtrace path) are sharded
        # across the mesh; GOPs are independent, so no collectives run
        # until the host-side score averaging.
        self.mesh = mesh
        # Back-trace implementation for the device path; defaults to the
        # Mosaic kernel on TPU and to its XLA twin (bit-identical, tested)
        # elsewhere — Pallas has no CPU/GPU lowering outside interpret mode.
        if backtrace_impl is None:
            from dmcnet_tpu.ops.pallas_backtrace import (
                backtrace_warp_batch,
                backtrace_warp_batch_xla,
            )
            backtrace_impl = (backtrace_warp_batch
                              if jax.default_backend() == "tpu"
                              else backtrace_warp_batch_xla)
        self._backtrace = backtrace_impl

    @classmethod
    def from_checkpoint(cls, path, num_class=51, **kwargs):
        """Load a framework checkpoint (msgpack file or orbax directory)
        or a reference .pth.tar."""
        import os

        from dmcnet_tpu.train.checkpoints import (
            load_checkpoint_params,
            load_checkpoint_params_orbax,
        )
        from dmcnet_tpu.train.engine import TrainState

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
        # params/batch_stats only: serving templates carry no optimizer
        # moments, training checkpoints do
        if os.path.isdir(path):
            # a directory can only be orbax — no .pth.tar fallback, so a
            # restore failure surfaces as itself, not a pickle error
            state, _ = load_checkpoint_params_orbax(state, path)
        else:
            try:
                state, _ = load_checkpoint_params(state, path)
            except Exception:
                from dmcnet_tpu.train.checkpoints import (
                    load_reference_weights,
                )
                params, bstats, _, _ = load_reference_weights(state, None,
                                                              path)
                state = state.replace(params=params, batch_stats=bstats)
        return cls(state.params, state.batch_stats, num_class=num_class,
                   **kwargs)

    def _forward_u8(self, mv, res):
        """uint8-encoded representation -> logits; normalize exactly like
        the training pipeline (dataset.py:251-263).  Shared by the
        host-accumulated path (`_classify`) and the device-backtrace GOP
        program (`_gop_program`)."""
        if self.packed_cls is not None:
            # fully packed: +mv already fused into the generator weights,
            # and the u8 normalize folded into them too (input_affine) —
            # feed raw u8 (integers < 256 are exact in bf16)
            x = jnp.concatenate([mv, res], axis=-1).astype(jnp.bfloat16)
            return self.packed_cls(self.packed(x))
        mv = (mv.astype(jnp.float32) / 255.0 - 0.5) / MEAN_STD
        res = (res.astype(jnp.float32) / 255.0 - 0.5) \
            / jnp.asarray(IMAGENET_STD)
        x = jnp.concatenate([mv, res], axis=-1)
        if self.packed is not None:
            dmc = self.packed(x.astype(jnp.bfloat16)).astype(jnp.float32)
            dmc = dmc + mv if self.gen_flow_or_delta else dmc
            return self.model.apply(
                self.variables, dmc, method="classify", train=False)
        logits, _ = self.model.apply(
            self.variables, mv[:, None], res[:, None], train=False)
        return logits

    @functools.cached_property
    def _classify(self):
        def fn(mv, res):
            return self._forward_u8(mv, res)

        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        return jax.jit(fn, in_shardings=(s, s), out_shardings=s)

    @property
    def _gop_quant(self):
        """GOP-batch size quantum: 4 (executable bucketing) lifted to a
        multiple of the mesh size so every shard gets equal work."""
        import math

        return math.lcm(4, self.mesh.size) if self.mesh else 4

    def _chunk_ladder(self, chunk_gops):
        """Bucket ladder for right-sizing ragged tail chunks: power-of-2
        multiples of `_gop_quant`, capped at `chunk_gops`.  A 4-GOP tail
        under the default chunk_gops=64 used to ship a 64-row buffer —
        16x the H2D bytes (~0.7 MB/GOP through the RPC tunnel) and 16x
        the device rows for zero extra scores; the ladder bounds the
        executable count at log2(chunk/quant) while wasting at most 2x
        padding on any tail."""
        sizes, g = [], self._gop_quant
        while g < chunk_gops:
            sizes.append(g)
            g *= 2
        sizes.append(chunk_gops)
        return sizes

    @property
    def _clip_bucket(self):
        """Host-path clip-batch quantum: 16 (executable bucketing) lifted
        to a multiple of the mesh size.  Shared by predict_video and
        warmup so precompiled executables match live requests."""
        import math

        return math.lcm(16, self.mesh.size) if self.mesh else 16

    def _pack_gop_buffer(self, cm_b, if_b, fp_b, pk_b):
        """Flatten the GOP-batch arrays into the one-transfer uint8 buffer
        (see _gop_program).  With a mesh the layout is (ndev, bytes) —
        each row a contiguous per-shard sub-buffer, so sharding axis 0
        hands every device exactly its own GOPs."""

        def flat(sl):
            return np.concatenate([
                (cm_b[sl] + 128).astype(np.uint8).ravel(), if_b[sl].ravel(),
                fp_b[sl].ravel(), pk_b[sl].ravel()])

        if self.mesh is None:
            return flat(slice(None))
        n = self.mesh.size
        gs = cm_b.shape[0] // n
        return np.stack([flat(slice(k * gs, (k + 1) * gs))
                         for k in range(n)])

    @functools.cached_property
    def _gop_program(self):
        """Per-instance memoized program builder: a class-level lru_cache
        on the bound method would key by self and pin every predictor's
        params + compiled executables for process lifetime (checkpoint
        rotation in a long-running server would leak old models)."""
        return functools.lru_cache(maxsize=16)(self._gop_program_impl)

    def _gop_program_impl(self, g, t, h, w, cell, n_pick):
        """Jitted GOP-batch program: block-list cell MVs + I-frames +
        (host-cropped) picked frames -> (logits, cropped mv_u8, cropped
        res_u8), entirely on device.

        Replaces the host's dense rasterize + accumulate + u8 encode
        (cv_accumulate_gop_u8) with the Pallas back-trace kernel plus the
        exact integer u8 encoding (trunc-toward-zero minmax scale, +128
        clip — bit-identical to the native path, coviar_decode.cpp:495-556;
        reference semantics coviar_data_loader.c:97-124).

        The T-axis pick is an f32 one-hot contraction (MXU batch-matmul),
        NOT take_along_axis — XLA lowers the latter to a per-element
        gather that cost ~100 ms per 48-frame batch on v5e; all gathered
        values are integers < 2^24, so the f32 contraction is bit-exact.
        Crop precedes the contraction so it moves size^2 pixels, not
        h*w.

        All inputs arrive as ONE flat uint8 buffer: through an RPC device
        tunnel each transfer pays ~25 ms latency, so 4 small arrays cost
        ~110 ms/video while one combined buffer costs one round trip.
        Cell MVs ride as int8+128 (|mv| <= max_mv(cell) <= 56) and picks
        as uint8 (< 256 frames/GOP); both are exact.

        With a mesh, `g` is the GLOBAL padded GOP count (a multiple of
        mesh.size — see _gop_quant); the same per-shard body runs under
        shard_map on g/ndev GOPs each, the buffer arriving as one
        (ndev, bytes) array sharded on axis 0 (_pack_gop_buffer layout).
        GOPs are independent, so the program has no collectives."""
        backtrace_warp_batch = self._backtrace

        if self.mesh is not None:
            assert g % self.mesh.size == 0, (g, self.mesh.size)
            g = g // self.mesh.size
        size = self.input_size
        scale = float(127.5 / 20.0) if self.mv_minmaxnorm else 0.0
        y0 = max((h - size) // 2, 0)
        x0 = max((w - size) // 2, 0)
        ncy, ncx = h // cell, w // cell
        n_cm = g * t * ncy * ncx * 2
        n_if = g * h * w * 3
        n_fp = g * n_pick * size * size * 3

        def fn(buf):
            cell_mvs = (buf[:n_cm].reshape(g, t, ncy, ncx, 2)
                        .astype(jnp.int32) - 128)
            iframes = buf[n_cm:n_cm + n_if].reshape(g, h, w, 3)
            picked_frames = buf[n_cm + n_if:n_cm + n_if + n_fp] \
                .reshape(g, n_pick, size, size, 3)
            picks = buf[n_cm + n_if + n_fp:].reshape(g, n_pick) \
                .astype(jnp.int32)
            ifr = jnp.transpose(iframes.astype(jnp.int32), (0, 3, 1, 2))
            accu, warped = backtrace_warp_batch(cell_mvs, ifr, h, w,
                                                cell=cell)
            accu = accu[..., y0:y0 + size, x0:x0 + size]
            warped = warped[..., y0:y0 + size, x0:x0 + size]
            onehot = (picks[:, :, None]
                      == jnp.arange(t, dtype=jnp.int32)).astype(jnp.float32)
            acc_p = jnp.einsum(
                "gpt,gtcyx->gpcyx", onehot, accu.astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            warp_p = jnp.einsum(
                "gpt,gtcyx->gpcyx", onehot, warped.astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            hc, wc = accu.shape[-2], accu.shape[-1]
            ix = x0 + jnp.arange(wc, dtype=jnp.int32)[None, None, None, :]
            iy = y0 + jnp.arange(hc, dtype=jnp.int32)[None, None, :, None]
            vx = ix - acc_p[:, :, 0]
            vy = iy - acc_p[:, :, 1]
            if scale:
                # (int)(v * scale) in C truncates toward zero; scale
                # 127.5/20 = 51/8 is exact in f32, so f32 trunc == C double
                vx = jnp.trunc(vx.astype(jnp.float32) * scale)
                vx = vx.astype(jnp.int32)
                vy = jnp.trunc(vy.astype(jnp.float32) * scale)
                vy = vy.astype(jnp.int32)
            mv_u8 = jnp.clip(jnp.stack([vx, vy], -1) + 128, 0,
                             255).astype(jnp.uint8)
            fr_p = picked_frames[:, :, :hc, :wc].astype(jnp.int32)
            res = fr_p - jnp.transpose(warp_p, (0, 1, 3, 4, 2))
            res_u8 = jnp.clip(res + 128, 0, 255).astype(jnp.uint8)
            if hc != size or wc != size:
                pad = [(0, 0), (0, 0), (0, size - hc), (0, size - wc),
                       (0, 0)]
                mv_u8 = jnp.pad(mv_u8, pad)
                res_u8 = jnp.pad(res_u8, pad)
            logits = self._forward_u8(
                mv_u8.reshape((g * n_pick, size, size, 2)),
                res_u8.reshape((g * n_pick, size, size, 3)))
            return logits, mv_u8, res_u8

        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P

        ax = self.mesh.axis_names[0]
        # check_vma off: the pallas back-trace call doesn't annotate
        # varying-across-mesh metadata on its out shapes; the program is
        # per-shard independent (no collectives), so the check buys nothing.
        return jax.jit(jax.shard_map(lambda b: fn(b[0]), mesh=self.mesh,
                                     in_specs=P(ax), out_specs=P(ax),
                                     check_vma=False))

    def warmup(self, geometries=((256, 320),), t=12, cell=16,
               frames_per_gop=3, chunk_gops=64, host_buckets=(16,)):
        """Precompile the serving programs so live traffic never pays an
        XLA compile (first-compile through the remote TPU helper can take
        minutes; steady-state requests are milliseconds).

        `geometries` are the stream shapes expected in production, as
        (height, width) or (height, width, t[, cell]) tuples; the
        program cache key is (gops, t, h, w, cell, picks), so t and cell
        must match live traffic for the warm to hit — `t` is the MAX GOP
        frame count of the stream (12 for the standard GOP-12 encodes)
        and `cell` the MV cell size (16 covers MPEG-4 1MV streams; 8
        when 4MV blocks appear).  `chunk_gops` must match the later
        `predict_videos` argument.  `host_buckets` precompiles the
        host-fallback classifier at the given padded clip counts
        (`predict_video` buckets to 16).

        The full `_chunk_ladder(chunk_gops)` is compiled per geometry
        (ragged tail chunks dispatch at the smallest covering bucket),
        so warmup costs log2(chunk/quant)+1 compiles per geometry in
        exchange for live traffic never compiling.
        """
        quant = self._gop_quant
        top = -(-chunk_gops // quant) * quant
        size = self.input_size
        for geom in geometries:
            h, w = geom[0], geom[1]
            t_g = geom[2] if len(geom) > 2 else t
            cell_g = geom[3] if len(geom) > 3 else cell
            for g in self._chunk_ladder(top):
                fn = self._gop_program(g, t_g, h, w, cell_g,
                                       frames_per_gop)
                cm_b = np.zeros((g, t_g, h // cell_g, w // cell_g, 2),
                                np.int32)
                if_b = np.zeros((g, h, w, 3), np.uint8)
                fp_b = np.zeros((g, frames_per_gop, size, size, 3),
                                np.uint8)
                pk_b = np.ones((g, frames_per_gop), np.uint8)
                buf = self._pack_gop_buffer(cm_b, if_b, fp_b, pk_b)
                logits, _, _ = fn(jnp.asarray(buf))
                jax.block_until_ready(logits)
        for n in host_buckets:
            n = -(-int(n) // self._clip_bucket) * self._clip_bucket
            out = self._classify(
                jnp.zeros((n, size, size, 2), jnp.uint8),
                jnp.zeros((n, size, size, 3), jnp.uint8))
            jax.block_until_ready(out)

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

    def _segment_picks(self, reader, segments):
        """Reference TSN test protocol: `segments` segment-centre P-frames
        over the whole video (code/dmcnet/test.py:48 with --test-segments
        25; centre formula dataset.py:139-149) -> {gop_index: (positions,
        weights)}.  Sampling the protocol's ~25 frames instead of every
        P-frame of every GOP cuts the host entropy-decode work by
        ~num_gops/25 on long videos.  Duplicate picks (short videos) are
        deduped per GOP and carried as integer weights so the score is the
        exact protocol average.  Frame->GOP mapping uses the stream's
        ACTUAL GOP boundaries (== the reference's fixed --gop 12 on the
        MPEG-4 re-encodes it supports; still correct on irregular
        streams)."""
        lens = [reader.gop_len(g) for g in range(reader.num_gops)]
        starts = np.concatenate([[0], np.cumsum(lens)])
        # P-frame count (frame 0 of each stream is the first I-frame;
        # the protocol excludes index 0, dataset.py:46-60)
        n = reader.num_frames - 1
        by_gop = {}
        for seg in range(segments):
            idx = int(np.round((n - 1) / segments * (seg + 0.5))) + 1
            g = int(np.searchsorted(starts, idx, side="right")) - 1
            g = min(g, reader.num_gops - 1)
            pos = idx - int(starts[g])
            if pos == 0:  # I-frame position: previous GOP's last P-frame
                g = max(g - 1, 0)
                pos = lens[g] - 1
            pos = min(max(pos, 1), lens[g] - 1) if lens[g] > 1 else 0
            by_gop.setdefault(g, {}).setdefault(pos, [0])[0] += 1
        return {g: (np.asarray(sorted(d), np.int32),
                    np.asarray([d[p][0] for p in sorted(d)], np.float32))
                for g, d in by_gop.items()}

    def predict_video(self, path, frames_per_gop=3, backend="auto",
                      segments=None):
        """Average logits over sampled P-frames: `frames_per_gop` evenly
        spaced per GOP (every GOP decoded), or — with `segments=N` — the
        reference TSN test protocol's N segment-centre frames over the
        whole video (only the GOPs that own a pick are decoded; see
        `_segment_picks`).

        All sampled frames of the video go to the device as ONE batch — one
        dispatch per video instead of one per GOP, which matters when the
        device sits behind an RPC boundary.

        `backend`: "device" back-traces on the accelerator from MV block
        lists (host does entropy decode only — no dense rasterize, no
        accumulate, no u8 encode); "host" is the native-accumulate path;
        "auto" tries device and falls back per video when the stream
        doesn't qualify (unaligned blocks, |mv| beyond the kernel bound).
        """
        if backend in ("auto", "device"):
            try:
                out = self._predict_video_device(path, frames_per_gop,
                                                 segments=segments)
            except Exception:
                # e.g. no Mosaic lowering on this backend (CPU without
                # interpret mode): "auto" degrades to the host path
                if backend == "device":
                    raise
                out = None
            if out is not None:
                return out
            if backend == "device":
                raise ValueError(
                    f"{path}: stream does not qualify for the device "
                    "back-trace path")
        mvs, ress, wts = [], [], []
        with _cached_reader(path) as reader:
            by_gop = (self._segment_picks(reader, segments)
                      if segments else None)
            gops = sorted(by_gop) if segments else range(reader.num_gops)
            for g in gops:
                frames, mv_maps = reader.decode_gop(g)
                if len(frames) < 2:
                    continue
                mv, res = gop_mv_residual_u8(
                    mv_maps, frames, True,
                    20 if self.mv_minmaxnorm else None)
                if segments:
                    pick, w = by_gop[g]
                    pick = np.minimum(pick, len(frames) - 1)
                else:
                    pick = np.linspace(1, len(frames) - 1,
                                       min(frames_per_gop, len(frames) - 1))
                    pick = np.unique(np.round(pick).astype(int))
                    w = np.ones(len(pick), np.float32)
                mvs.append(self._center_crop(mv[pick]))
                ress.append(self._center_crop(res[pick]))
                wts.append(w)
        if not mvs:
            raise ValueError(f"no usable GOPs in {path}")
        mv = np.concatenate(mvs)
        res = np.concatenate(ress)
        wts = np.concatenate(wts)
        n = len(mv)
        # bucket to multiples of 16 clips so videos of similar length share
        # one compiled executable (padded rows dropped host-side); with a
        # mesh, lift to a multiple of the mesh size for equal shards
        bucket = self._clip_bucket
        padded = -(-n // bucket) * bucket
        if padded != n:
            reps = [1] * (n - 1) + [padded - n + 1]
            mv = np.repeat(mv, reps, axis=0)
            res = np.repeat(res, reps, axis=0)
        logits = self._classify(jnp.asarray(mv), jnp.asarray(res))
        lg = np.asarray(logits)[:n]
        return (lg * wts[:, None]).sum(axis=0) / wts.sum()

    def _gather_video_device(self, path, frames_per_gop, segments=None):
        """Host side of the device-backtrace path for one video: entropy
        decode + block-list -> cell-grid conversion.  Returns
        (cms, gop_data, picks, counts, weights, h, w) — gop_data rows are
        (iframe (H, W, 3), cropped picked frames (count, size, size, 3),
        gop_len), picks rows UNPADDED (the caller pads to its batch-wide
        row width) — or None when any GOP disqualifies (caller falls back
        to the host-accumulate path).  `segments=N` switches to the
        reference 25-segment protocol (`_segment_picks`): only the GOPs
        owning a pick are decoded, and duplicate picks ride as weights.

        Only the I-frame and the cropped picked frames are RETAINED: a
        whole-split batch would otherwise hold every decoded frame of
        every video in host RAM (~25x more) until its geometry group is
        processed."""
        from dmcnet_tpu.ops.pallas_backtrace import cell_mv_from_blocks

        cms, gop_data, picks, counts, weights = [], [], [], [], []
        with _cached_reader(path) as reader:
            h, w = reader.height, reader.width
            by_gop = (self._segment_picks(reader, segments)
                      if segments else None)
            gops = sorted(by_gop) if segments else range(reader.num_gops)
            for gidx in gops:
                def picks_for(n):
                    if segments:
                        p, w_ = by_gop[gidx]
                        return np.minimum(p, n - 1), w_
                    p = np.linspace(1, n - 1, min(frames_per_gop, n - 1))
                    p = np.unique(np.round(p).astype(np.int32))
                    return p, np.ones(len(p), np.float32)

                # Picks are known from the GOP length BEFORE decoding, so
                # the native decoder can skip the YUV->BGR conversion of
                # every frame we won't ship (entropy decode still covers
                # all of them — P-frame reconstruction is sequential).
                n_exp = reader.gop_len(gidx)
                keep = None
                if n_exp >= 2:
                    pick, wt = picks_for(n_exp)
                    # bool dtype matters: an integer array would be read
                    # as an INDEX list by decode_gop_blocks
                    keep = np.zeros(n_exp, bool)
                    keep[0] = True
                    keep[pick] = True
                frames, _, blocks, n_blocks = reader.decode_gop_blocks(
                    gidx, skip_dense=True, keep=keep)
                if len(frames) < 2:
                    continue
                if len(frames) != n_exp:
                    # decode shortfall: the predicted picks are invalid and
                    # skipped conversions may cover real rows — re-decode
                    frames, _, blocks, n_blocks = reader.decode_gop_blocks(
                        gidx, skip_dense=True)
                    pick, wt = picks_for(len(frames))
                cm, cell = cell_mv_from_blocks(blocks, n_blocks, h, w)
                if cm is None:
                    return None
                counts.append(len(pick))
                weights.append(wt)
                picks.append(pick)
                cms.append((cm, cell))
                gop_data.append((frames[0], self._center_crop(frames[pick]),
                                 frames.shape[0]))
        if not cms:
            return None
        return cms, gop_data, picks, counts, weights, h, w

    def _pack_rows(self, rows, g, tmax, h, w, cell, n_pick):
        """Assemble real GOP rows `(cm, cell_of_cm, iframe, fp, pick)` into
        the flat uint8 device buffer, padded to `g` GOP rows.  The ONE
        packing implementation behind both the per-video device path and
        the streamed chunk dispatch — cells expand to the batch-wide `cell`
        (a 16-grid expands exactly to 8: uniform motion), pick rows edge-pad
        to `n_pick` (padded slots re-score a real frame and are masked out
        by `counts`/`len(pick)` on the host)."""
        ncy, ncx = h // cell, w // cell
        size = self.input_size
        cm_b = np.zeros((g, tmax, ncy, ncx, 2), np.int32)
        if_b = np.zeros((g, h, w, 3), np.uint8)
        fp_b = np.zeros((g, n_pick, size, size, 3), np.uint8)
        pk_b = np.ones((g, n_pick), np.uint8)
        for i, (cm, c, iframe, fp, pick) in enumerate(rows):
            if c != cell:
                cm = np.repeat(np.repeat(cm, c // cell, axis=1),
                               c // cell, axis=2)
            cm_b[i, :cm.shape[0]] = cm
            if_b[i] = iframe
            # Only the I-frame and the picked frames go to the device
            # (pre-cropped): 3-4x fewer H2D bytes than shipping every
            # decoded frame of the GOP.
            fp_b[i, :fp.shape[0]] = fp
            pk_b[i, :len(pick)] = pick
            pk_b[i, len(pick):] = pick[-1]
        return self._pack_gop_buffer(cm_b, if_b, fp_b, pk_b)

    def _predict_video_device(self, path, frames_per_gop=3, segments=None):
        """Device-backtrace inference from MV block lists; returns None
        when any GOP disqualifies (caller falls back to the host path).

        Host work per GOP shrinks to entropy decode + a vectorized
        block-list -> cell-grid scatter (a few thousand ints); the dense
        per-pixel rasterize (skip_dense=True), the accumulate recursion and
        the u8 encode all move into the jitted GOP program.  GOP count is
        padded to a multiple of 4 and frame counts to the batch max so
        videos share a small set of compiled programs."""
        gathered = self._gather_video_device(path, frames_per_gop,
                                             segments=segments)
        if gathered is None:
            return None
        cms, gop_data, picks, counts, weights, h, w = gathered
        cell = min(c for _, c in cms)
        g_real = len(cms)
        tmax = max(t for _, _, t in gop_data)
        if tmax > 255:
            return None  # picks ride as uint8 in the combined buffer
        g_pad = -(-g_real // self._gop_quant) * self._gop_quant
        n_pick = max(frames_per_gop, max(counts))
        rows = [(cm, c, iframe, fp, pick) for (cm, c), (iframe, fp, _), pick
                in zip(cms, gop_data, picks)]
        fn = self._gop_program(g_pad, tmax, h, w, cell, n_pick)
        buf = self._pack_rows(rows, g_pad, tmax, h, w, cell, n_pick)
        logits, _, _ = fn(jnp.asarray(buf))
        logits = np.asarray(logits).reshape(g_pad, n_pick, -1)
        rows = np.concatenate([logits[i, :k] for i, k in enumerate(counts)])
        wts = np.concatenate(weights)
        return (rows * wts[:, None]).sum(axis=0) / wts.sum()

    def predict_videos(self, paths, frames_per_gop=3, backend="auto",
                       chunk_gops=64, host_workers=0, on_error="raise",
                       segments=None):
        """Batched whole-video inference: GOPs of MANY videos share device
        calls, in fixed `chunk_gops`-GOP chunks (one compiled program per
        (geometry, cell, t-bucket) key).  Behind an RPC device boundary
        each call pays a fixed dispatch+fetch latency, so per-video calls
        leave the device idle between videos; chunking amortizes it.

        The dispatch is STREAMED: each chunk is packed and dispatched as
        soon as enough gathered GOPs accumulate, while later videos are
        still being host-gathered — the device scores chunk k under the
        host's entropy decode of videos k+1.., and jax's async dispatch
        additionally overlaps chunk k+1's packing with chunk k's compute.
        Logits are fetched only after every chunk is in flight.

        `host_workers` > 1 threads the per-video host gather (entropy
        decode + block-list -> cell-grid): the native decode runs outside
        the GIL (codec/native), so this scales with host cores.  Results
        are deterministic — videos are consumed in submission order
        regardless of which worker finishes first.

        `segments=N` scores by the reference TSN test protocol (N
        segment-centre frames per video, `_segment_picks`) instead of
        `frames_per_gop` frames from EVERY GOP — on long videos an
        ~num_gops/N reduction in host decode work.

        `on_error="zero"` keeps a batch alive through unreadable/corrupt
        videos: their score is a zero vector (argmax 0, harmless in late
        fusion) and the failure is reported on stderr — the data-level
        fault-tolerance stance of the reference pipelines (zero-fill in
        dmcnet dataset.py:191-193, retry/backup in I3D video_iterator).

        Returns a list of score vectors aligned with `paths` — duplicate
        paths are gathered and scored ONCE and the score fans out to every
        position (later positions get a fresh copy, so callers that weight
        scores in place never alias).  Videos that disqualify from the
        device path (see predict_video) fall back to the host-accumulate
        path individually."""
        order = list(paths)
        paths = list(dict.fromkeys(order))
        results = {}
        per_video = {}   # path -> [(logit rows, weight rows), ...]
        pending = {}     # (h, w) -> buffered flat GOP rows
        in_flight = []   # (logits ref, chunk rows, n_pick)
        chunk_gops = -(-chunk_gops // self._gop_quant) * self._gop_quant

        def zero_score(p, exc):
            import sys

            print(f"predict_videos: {p} failed ({exc!r}); scoring zeros",
                  file=sys.stderr)
            # fresh array per video: callers may weight scores in place
            results[p] = np.zeros(self.model.num_class, np.float32)

        def gather_one(p):
            """-> (gathered, None) | (None, exc): keep the real error for
            the on_error report instead of collapsing it to 'does not
            qualify'."""
            if backend not in ("auto", "device"):
                return None, None
            try:
                return self._gather_video_device(p, frames_per_gop,
                                                 segments=segments), None
            except Exception as exc:
                return None, exc

        def dispatch(hw, chunk):
            """Pack one chunk and enqueue it on the device (async).  The
            program key quantizes tmax up (multiples of 12) and takes the
            chunk-wide min cell / max pick count, so chunks of similar
            streams share executables (warmup precompiles t=12).  Ragged
            tail chunks are padded only to the next `_chunk_ladder`
            bucket, not to the full chunk_gops — the H2D bytes of padded
            rows are pure waste through the RPC tunnel."""
            h, w = hw
            g = next(s for s in self._chunk_ladder(chunk_gops)
                     if s >= len(chunk))
            cell = min(c for *_, c, _ in chunk)
            tmax = max(12, -(-max(t for *_, t in chunk) // 12) * 12)
            n_pick = max(frames_per_gop,
                         max(len(pk) for *_, pk, _, _, _ in chunk))
            rows = [(cm, c, iframe, fp, pick)
                    for (_, cm, iframe, fp, pick, _, c, _) in chunk]
            fn = self._gop_program(g, tmax, h, w, cell, n_pick)
            buf = self._pack_rows(rows, g, tmax, h, w, cell, n_pick)
            logits, _, _ = fn(jnp.asarray(buf))
            in_flight.append((logits, chunk, n_pick))

        def consume(p, gathered, gather_exc):
            tmax_v = (max(t for _, _, t in gathered[1])
                      if gathered else 0)
            if gathered is None or tmax_v > 255:
                if backend == "device":
                    # strict device mode: no host fallback, but on_error
                    # "zero" still keeps the rest of the batch alive
                    exc = gather_exc or ValueError(
                        f"{p}: stream does not qualify for the device "
                        "back-trace path")
                    if on_error != "zero":
                        raise exc
                    zero_score(p, exc)
                    return
                try:
                    results[p] = self.predict_video(p, frames_per_gop,
                                                    backend="host",
                                                    segments=segments)
                except Exception as exc:
                    # zero-fill covers DATA errors (the reference's
                    # stance); device/infra failures (tunnel drop, OOM)
                    # must still abort — zero-scoring a systemic outage
                    # would report garbage accuracy as success
                    infra = "XlaRuntimeError" in type(exc).__name__ \
                        or isinstance(exc, MemoryError)
                    if on_error != "zero" or infra:
                        raise
                    zero_score(p, exc)
                return
            cms, gd, pk, cn, wt, h, w = gathered
            per_video[p] = []
            buf = pending.setdefault((h, w), [])
            for (cm, c), (iframe, fp, t), pick, count, w_ in zip(
                    cms, gd, pk, cn, wt):
                buf.append((p, cm, iframe, fp, pick, w_, c, t))
            while len(buf) >= chunk_gops:
                dispatch((h, w), buf[:chunk_gops])
                del buf[:chunk_gops]

        if host_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            # pool.map yields in submission order while workers run ahead,
            # so chunks dispatch as soon as the next IN-ORDER video lands
            with ThreadPoolExecutor(max_workers=host_workers) as pool:
                for p, (gathered, exc) in zip(paths,
                                              pool.map(gather_one, paths)):
                    consume(p, gathered, exc)
        else:
            for p in paths:
                consume(p, *gather_one(p))
        for hw, buf in pending.items():
            if buf:  # flush the ragged tail chunk of each geometry
                dispatch(hw, buf)
        for logits, chunk, n_pick in in_flight:
            lg = np.asarray(logits)
            lg = lg.reshape(-1, n_pick, lg.shape[-1])
            for i, (p, *_, pick, w_, c, t) in enumerate(chunk):
                per_video[p].append((lg[i, :len(pick)], w_))
        for p, rows in per_video.items():
            lg = np.concatenate([r for r, _ in rows])
            wt = np.concatenate([w_ for _, w_ in rows])
            results[p] = (lg * wt[:, None]).sum(axis=0) / wt.sum()
        seen = set()
        out = []
        for p in order:
            out.append(np.array(results[p]) if p in seen else results[p])
            seen.add(p)
        return out
