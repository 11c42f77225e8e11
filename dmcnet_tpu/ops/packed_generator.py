"""Space-to-depth packed DMC generator — the inference hot path.

The dense estimators' conv channel counts (5 -> 8/8/6/4/2 -> 2,
reference code/dmcnet/model.py:172-194) are pathologically small for the
128x128 MXU: XLA reaches only ~2-6% utilization and the generator caps the
whole DMC+classify pipeline.  This module rewrites the generator as an
EXACTLY equivalent sequence of convs in a space-to-depth packed layout:

    pack s=2: (B, 224, 224, C) -> (B, 112, 112, 4C)

Each original 3x3 conv becomes one packed 3x3 conv whose input/output
channel counts are 4x larger (20 -> 32, ..., 132 -> 8), quadrupling MXU
lane utilization at a 4x FLOP inflation that the MXU absorbs for free —
measured ~2.1x end-to-end generator speedup on v5e.  LeakyReLU and the
dense concatenation are position-wise permutations, so they commute with
packing; the packed weights are exact linear transforms of the original
weights (zero-filled block-Toeplitz), making outputs bit-identical in f32.

Used for inference/serving (bench.py); training keeps the faithful layout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp
from jax import lax


def space_to_depth(x, s):
    """(B, H, W, C) -> (B, H/s, W/s, s*s*C); channel index (py*s+px)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def depth_to_space(x, s):
    b, hs, ws, sc = x.shape
    c = sc // (s * s)
    x = x.reshape(b, hs, ws, s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hs * s, ws * s, c)


def repack(x, s_from, s_to, c):
    """Re-express an s_from space-to-depth packing as an s_to packing
    without a full depth_to_space/space_to_depth round trip:
    (B, H/s_from, W/s_from, s_from^2*C) -> (B, H/s_to, W/s_to, s_to^2*C).

    Bridges a generator run at s=4 (fewer, wider convs — the faster
    standalone config, docs/PERF_NOTES.md section 3) into the s=2 packed
    classifier stem (ops/packed_resnet.py).
    """
    assert s_from % s_to == 0, (s_from, s_to)
    b, hf, wf, _ = x.shape
    r = s_from // s_to
    x = x.reshape(b, hf, wf, r, s_to, r, s_to, c)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return x.reshape(b, hf * r, wf * r, s_to * s_to * c)


def _packed_index(segments, s, p, ci):
    """Packed channel index of (block position p, original channel ci) in a
    packed concat of tensors with original channel counts `segments`."""
    off = 0
    for seg in segments:
        if ci < seg:
            return off + p * seg + ci
        off += seg * s * s
        ci -= seg
    raise IndexError(ci)


def pack_conv3x3(w, b, s, in_segments):
    """Transform a 3x3 stride-1 SAME conv (kh, kw, C_in, C_out) to the packed
    layout.  `in_segments`: original channel counts of the (packed) concat
    segments making up the input, in order.

    Returns (w_packed (3, 3, s*s*C_in, s*s*C_out), b_packed (s*s*C_out,)).
    """
    kh, kw, c_in, c_out = w.shape
    assert kh == kw == 3
    assert sum(in_segments) == c_in
    wp = np.zeros((3, 3, s * s * c_in, s * s * c_out), w.dtype)
    for qy in range(s):
        for qx in range(s):
            q_out = qy * s + qx
            for dy in range(3):
                for dx in range(3):
                    # original tap reaches pixel (qy+dy-1, qx+dx-1) of the
                    # block; split into packed tap (tby, tbx) in -1..1 and
                    # within-block position (py, px).
                    ay, ax = qy + dy - 1, qx + dx - 1
                    tby, py = (ay + s) // s - 1, (ay + s) % s
                    tbx, px = (ax + s) // s - 1, (ax + s) % s
                    p_in = py * s + px
                    idx = [_packed_index(in_segments, s, p_in, ci)
                           for ci in range(c_in)]
                    wp[tby + 1, tbx + 1, idx,
                       q_out * c_out:(q_out + 1) * c_out] = w[dy, dx]
    bp = None
    if b is not None:
        bp = np.tile(np.asarray(b), s * s)
    return wp, bp


@functools.lru_cache(maxsize=None)
def _pack_plan(s, in_segments, c_in):
    """Static scatter plan realizing `pack_conv3x3` as ONE jnp scatter-add.

    Returns index arrays (ky, kx, rows, qouts, sdy, sdx, sci), each of
    length s*s * 9 * c_in: destination (packed-kernel tap, packed input
    row, packed output block) and source (original tap, input channel) of
    every placed (c_in -> c_out) weight slab.  No two entries share a
    destination, so scatter-add == the reference's scatter-assign.
    """
    ky, kx, rows, qouts, sdy, sdx, sci = [], [], [], [], [], [], []
    for qy in range(s):
        for qx in range(s):
            q_out = qy * s + qx
            for dy in range(3):
                for dx in range(3):
                    ay, ax = qy + dy - 1, qx + dx - 1
                    tby, py = (ay + s) // s - 1, (ay + s) % s
                    tbx, px = (ax + s) // s - 1, (ax + s) % s
                    p_in = py * s + px
                    for ci in range(c_in):
                        ky.append(tby + 1)
                        kx.append(tbx + 1)
                        rows.append(_packed_index(in_segments, s, p_in, ci))
                        qouts.append(q_out)
                        sdy.append(dy)
                        sdx.append(dx)
                        sci.append(ci)
    return tuple(np.asarray(a, np.int32)
                 for a in (ky, kx, rows, qouts, sdy, sdx, sci))


def pack_conv3x3_jnp(w, b, s, in_segments):
    """Differentiable twin of `pack_conv3x3` for TRAINING in the packed
    layout: same zero-filled block-Toeplitz transform, expressed as jnp ops
    on the (traced) unpacked weights so gradients flow back to the faithful
    parameter tree.  The scatter plan is static (cached per shape); XLA sees
    one scatter-add over a tensor of a few hundred KB per step — noise next
    to the convs it unlocks.
    """
    _, _, c_in, c_out = w.shape
    ky, kx, rows, qouts, sdy, sdx, sci = _pack_plan(
        s, tuple(in_segments), c_in)
    wp = jnp.zeros((3, 3, s * s * c_in, s * s, c_out), w.dtype)
    wp = wp.at[ky, kx, rows, qouts, :].add(w[sdy, sdx, sci, :])
    wp = wp.reshape(3, 3, s * s * c_in, s * s * c_out)
    bp = jnp.tile(b, s * s) if b is not None else None
    return wp, bp


class QuantizedPackedEstimator:
    """EXPERIMENTAL int8 inference mode of the packed generator.

    Per-output-channel weight scales + per-stage activation scales (one-shot
    calibration); packed convs run as int8 x int8 -> int32 MXU matmuls.
    Output error vs f32 is bounded by the test suite (<5% relative — noise
    on the DMC cue comparable to augmentation).

    Status: the raw int8 convs measure ~2x the bf16 packed path on v5e, but
    the current XLA lowering does not fuse the requant/dequant glue into the
    conv epilogues, leaving this scheme glue-bound and NET SLOWER than
    `PackedDenseEstimator` today (8.4k vs 15.8k clips/s).  Kept as a
    correctness-tested option for future XLA versions / int8-native
    deployments; the bf16 packed path remains the production default.
    """

    def __init__(self, params, calib_x, widths=(8, 8, 6, 4, 2), ch_in=5,
                 s=2):
        base = PackedDenseEstimator(params, widths=widths, ch_in=ch_in, s=s,
                                    dtype=jnp.float32)
        self.s = s
        self.n = len(base.weights)
        self.layers = []
        # Calibrate per-stage input scales with one f32 forward pass.
        h = space_to_depth(jnp.asarray(calib_x, jnp.float32), s)
        for i, (wp, bp) in enumerate(base.weights):
            a_scale = float(jnp.max(jnp.abs(h))) / 127.0 + 1e-8
            w = np.asarray(wp, np.float32)
            w_scale = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0 \
                + 1e-8
            w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
            self.layers.append((
                jnp.asarray(w_q),
                jnp.asarray(w_scale * a_scale, jnp.float32),
                jnp.float32(a_scale),
                bp.astype(jnp.float32),
            ))
            y = lax.conv_general_dilated(
                h, jnp.asarray(w), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bp
            if i < self.n - 1:
                y = jnp.where(y > 0, y, 0.1 * y)
                h = jnp.concatenate([y, h], axis=-1)

    def __call__(self, x):
        s = self.s
        h = space_to_depth(x.astype(jnp.float32), s)
        for i, (w_q, deq, a_scale, bp) in enumerate(self.layers):
            h_q = jnp.clip(jnp.round(h / a_scale), -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                h_q, w_q, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * deq + bp
            if i < self.n - 1:
                y = jnp.where(y > 0, y, 0.1 * y)
                h = jnp.concatenate([y, h], axis=-1)
            else:
                return depth_to_space(y, s)


class PackedDenseEstimator:
    """Packed-inference twin of the dense estimator family.

    Build from trained flax params (`params['gen_flow_model']` layout of
    generators._DenseEstimator: conv_0..conv_4, predict_flow) and call on
    NHWC inputs; outputs match the unpacked model.
    """

    def __init__(self, params, widths=(8, 8, 6, 4, 2), ch_in=5, s=2,
                 dtype=jnp.bfloat16, packed_output=False,
                 fuse_mv_delta=False, input_affine=None):
        self.s = s
        self.ch_in = ch_in
        # packed_output=True keeps the result in the space-to-depth layout
        # ((B, H/s, W/s, s*s*2), channel index (py*s+px)*2 + c) so a packed
        # consumer (ops/packed_resnet.py stem) can run without the
        # depth_to_space/space_to_depth round-trip.
        self.packed_output = packed_output
        # input_affine=(scale, shift), each (ch_in,): the model was trained
        # on `scale*x + shift` but will be CALLED with raw x — the serving
        # normalize (mv minmaxnorm + /255 + mean/std, dataset.py:260-262)
        # absorbed into the conv weights.  The raw input rides the dense
        # concatenation into EVERY conv, so every layer's raw-segment rows
        # are rescaled; the shift becomes a bias, EXCEPT that SAME zero-
        # padding means border pixels see fewer raw taps than interior ones
        # — so the shift is absorbed as a per-position bias PLANE (interior
        # = full sum(w*shift), border ring = in-bounds taps only), computed
        # per spatial shape at trace time and folded into the bias add the
        # layer already performs.  Zero extra per-step ops; exact.
        self.input_affine = input_affine
        if input_affine is not None:
            a_in = np.asarray(input_affine[0], np.float32)
            b_in = np.asarray(input_affine[1], np.float32)
            assert a_in.shape == b_in.shape == (ch_in,)
        self.weights = []
        self._tap_shift = []   # per layer: S (3, 3, c_out) = sum_raw w*shift
        self._corr_cache = {}  # (layer, H, W) -> jnp bias plane
        segments = [ch_in]
        names = [f"conv_{i}" for i in range(len(widths))] + ["predict_flow"]
        for i, name in enumerate(names):
            w = np.asarray(params[name]["kernel"], np.float32)
            b = np.asarray(params[name]["bias"], np.float32)
            wp, bp = pack_conv3x3(w, b, s, segments)
            if name == "predict_flow" and fuse_mv_delta:
                # gen_flow_or_delta=1 (+mv, reference model.py:345-346)
                # fused as an identity tap: predict_flow's input concat ends
                # with the original 5-ch input whose channels 0:2 are mv.
                # With input_affine the tap is folded like any other raw-row
                # weight below, so the output still adds the NORMALIZED mv.
                for p in range(s * s):
                    for c in range(2):
                        wp[1, 1, _packed_index(segments, s, p, c
                                               + sum(segments[:-1])),
                           p * 2 + c] += 1.0
            if input_affine is not None:
                c_in = sum(segments)
                off = (c_in - ch_in) * s * s  # raw segment is always last
                tap_s = np.zeros((3, 3, wp.shape[-1]), np.float32)
                for p in range(s * s):
                    for ci in range(ch_in):
                        row = off + p * ch_in + ci
                        tap_s += wp[:, :, row, :] * b_in[ci]
                        wp[:, :, row, :] *= a_in[ci]
                self._tap_shift.append(tap_s)
            self.weights.append((jnp.asarray(wp, dtype),
                                 jnp.asarray(bp, dtype)))
            if i < len(widths):
                segments = [widths[i]] + segments
        self.dtype = dtype

    def _bias_plane(self, i, bp, hh, ww):
        """(hh, ww, c_out) bias for affine mode: layer bias + the absorbed
        input shift, with border positions crediting in-bounds taps only."""
        key = (i, hh, ww)
        if key not in self._corr_cache:
            tap_s = self._tap_shift[i]
            corr = np.broadcast_to(
                np.asarray(bp, np.float32), (hh, ww, tap_s.shape[-1])).copy()
            for dy in range(3):
                for dx in range(3):
                    y0, y1 = max(0, 1 - dy), min(hh, hh + 1 - dy)
                    x0, x1 = max(0, 1 - dx), min(ww, ww + 1 - dx)
                    corr[y0:y1, x0:x1] += tap_s[dy, dx]
            # cache NUMPY: a jnp array materialized inside a jit trace is a
            # tracer, and caching it across traces leaks (UnexpectedTracer)
            self._corr_cache[key] = corr
        return self._corr_cache[key]

    def __call__(self, x):
        """x: (B, H, W, ch_in) with H, W divisible by s -> (B, H, W, 2).

        With input_affine, x is the RAW (un-normalized) tensor.
        """
        s = self.s
        h = space_to_depth(x.astype(self.dtype), s)
        n = len(self.weights)
        for i, (wp, bp) in enumerate(self.weights):
            y = lax.conv_general_dilated(
                h, wp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            if self.input_affine is not None:
                y = (y + self._bias_plane(i, bp, *y.shape[1:3])).astype(
                    self.dtype)
            else:
                y = (y + bp.astype(jnp.float32)).astype(self.dtype)
            if i < n - 1:
                y = jnp.where(y > 0, y, 0.1 * y)  # LeakyReLU(0.1)
                h = jnp.concatenate([y, h], axis=-1)
            else:
                return y if self.packed_output else depth_to_space(y, s)
