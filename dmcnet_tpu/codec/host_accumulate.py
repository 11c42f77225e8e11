"""Vectorized NumPy GOP accumulation for the host data pipeline.

Same dense-map semantics as `accumulate.gop_mv_residual` (tested for
bit-parity), but running in data-loader workers so decoded GOPs are
accumulated once on the host and cached, keeping the accelerator free for
the train step.  The device path in `accumulate.py` remains the serving /
benchmark path.
"""

from __future__ import annotations

import ctypes

import numpy as np


def gop_mv_residual_native(mv_maps, frames_bgr, accumulate=True):
    """C++ fast path (cv_accumulate_gop): same outputs as the NumPy twin,
    ~10-20x faster per data-loader worker."""
    from dmcnet_tpu.codec.mpeg4 import _lib

    mv_maps = np.ascontiguousarray(mv_maps, np.int16)
    frames = np.ascontiguousarray(frames_bgr, np.uint8)
    t, h, w, _ = mv_maps.shape
    mv_out = np.empty((t, h, w, 2), np.int32)
    res_out = np.empty((t, h, w, 3), np.int32)
    _lib().cv_accumulate_gop(
        mv_maps.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, int(bool(accumulate)),
        mv_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        res_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return mv_out, res_out


def gop_mv_residual_u8(mv_maps, frames_bgr, accumulate=True,
                       minmax_bound=None):
    """C++ path emitting the uint8-encoded loader representation directly
    (mv min-max scale + +128 clip; residual +128 clip — dataset.py:195-213):
    no GIL-bound NumPy post-processing in data-loader workers."""
    from dmcnet_tpu.codec.mpeg4 import _lib

    mv_maps = np.ascontiguousarray(mv_maps, np.int16)
    frames = np.ascontiguousarray(frames_bgr, np.uint8)
    t, h, w, _ = mv_maps.shape
    mv_u8 = np.empty((t, h, w, 2), np.uint8)
    res_u8 = np.empty((t, h, w, 3), np.uint8)
    scale = (127.5 / minmax_bound) if minmax_bound else 0.0
    _lib().cv_accumulate_gop_u8(
        mv_maps.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, int(bool(accumulate)), scale,
        mv_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        res_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mv_u8, res_u8


def _identity(height, width):
    xs, ys = np.meshgrid(np.arange(width, dtype=np.int32),
                         np.arange(height, dtype=np.int32))
    return np.stack([xs, ys], axis=-1)


def gop_mv_residual_numpy(mv_maps, frames_bgr, accumulate=True):
    """NumPy twin of accumulate.gop_mv_residual: (T,H,W,2|3) int32 outputs."""
    mv_maps = np.asarray(mv_maps, np.int32)
    frames_bgr = np.asarray(frames_bgr)
    t, height, width, _ = mv_maps.shape
    ident = _identity(height, width)

    if accumulate:
        accu = np.empty((t, height, width, 2), np.int32)
        accu[0] = ident
        cur = ident
        for i in range(1, t):
            src_x = np.clip(ident[..., 0] - mv_maps[i, ..., 0], 0, width - 1)
            src_y = np.clip(ident[..., 1] - mv_maps[i, ..., 1], 0, height - 1)
            cur = cur[src_y, src_x]
            accu[i] = cur
        mv = ident[None] - accu
        base = frames_bgr[0].astype(np.int32)
        res = frames_bgr.astype(np.int32) - base[accu[..., 1], accu[..., 0]]
    else:
        mv = mv_maps.copy()
        res = np.zeros((t, height, width, 3), np.int32)
        for i in range(1, t):
            src_x = np.clip(ident[..., 0] - mv_maps[i, ..., 0], 0, width - 1)
            src_y = np.clip(ident[..., 1] - mv_maps[i, ..., 1], 0, height - 1)
            res[i] = (frames_bgr[i].astype(np.int32)
                      - frames_bgr[i - 1].astype(np.int32)[src_y, src_x])
    mv[0] = 0
    res[0] = 0
    return mv, res
