"""Drop-in replacement for the reference `coviar` CPython module.

Same call surface as coviar_data_loader.c:578-583 —

    load(path, gop_index, gop_pos, representation, accumulate) -> np.ndarray
    get_num_frames(path) -> int
    get_num_gops(path) -> int

with representation 0=iframe, 1=mv, 2=residual, and identical return shapes
and dtypes (iframe (H,W,3) uint8 BGR; mv (H,W,2) int32; residual (H,W,3)
int32).  Backed by the native GOP reader + the fused device kernels, with a
per-path reader cache, so repeated loads touch the file once per GOP rather
than re-decoding the file per call.
"""

from __future__ import annotations

import numpy as np

from dmcnet_tpu.codec.accumulate import gop_mv_residual
from dmcnet_tpu.codec.mpeg4 import shared_reader_cache

IFRAME, MV, RESIDUAL = 0, 1, 2


def _reader(path):
    # One process-wide reader cache shared with the datasets/serving: one
    # byte/count budget, one eviction policy — a process mixing the compat
    # API with the datasets never double-opens a file.
    return shared_reader_cache().get(path)


def get_num_frames(path):
    return _reader(path).num_frames


def get_num_gops(path):
    return _reader(path).num_gops


def load(path, gop_index, gop_pos, representation, accumulate):
    reader = _reader(path)
    frames, mv_maps = reader.decode_gop(gop_index)
    if gop_pos >= len(frames):
        gop_pos = len(frames) - 1
    if representation == IFRAME:
        return np.asarray(frames[gop_pos])
    mv, res = gop_mv_residual(mv_maps, frames, accumulate=bool(accumulate))
    if representation == MV:
        return np.asarray(mv[gop_pos])
    return np.asarray(res[gop_pos])
