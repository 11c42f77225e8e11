"""Dataset-prep transcoder tree conversion + coviar-compat edge modes."""

import os

import numpy as np

from dmcnet_tpu.codec import coviar_compat
from dmcnet_tpu.codec.convert import convert_tree
from dmcnet_tpu.codec.mpeg4 import VideoReader, encode_mpeg4


def _textured(rng, t, h, w):
    pad = 60
    canvas = (rng.integers(0, 256, size=(h + 2 * pad + t, w + 2 * pad + 2 * t,
                                         3)) // 8 * 8).astype(np.uint8)
    return np.stack([canvas[pad + i:pad + i + h, pad + 2 * i:pad + 2 * i + w]
                     for i in range(t)])


def test_convert_tree(tmp_path, rng):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    for sub in ("a", "b"):
        os.makedirs(src / sub)
        encode_mpeg4(src / sub / "v.avi", _textured(rng, 14, 480, 640),
                     gop_size=12, bit_rate=4_000_000)
    (src / "a" / "notes.txt").write_text("not a video")
    ok, failures = convert_tree(str(src), str(dst), height=360, workers=2)
    assert ok == 2 and not failures
    for sub in ("a", "b"):
        with VideoReader(dst / sub / "v.mp4") as r:
            assert r.height == 360 and r.width == 480
            assert r.num_frames >= 13


def test_coviar_compat_no_accumulate(tmp_path, rng):
    path = tmp_path / "v.avi"
    encode_mpeg4(path, _textured(rng, 14, 128, 192), gop_size=12,
                 bit_rate=4_000_000)
    mv = coviar_compat.load(str(path), 0, 4, coviar_compat.MV, False)
    res = coviar_compat.load(str(path), 0, 4, coviar_compat.RESIDUAL, False)
    assert mv.shape == (128, 192, 2) and mv.dtype == np.int32
    assert res.shape == (128, 192, 3)
    # Raw per-frame MV differs from the accumulated one at later positions.
    mv_acc = coviar_compat.load(str(path), 0, 4, coviar_compat.MV, True)
    assert not np.array_equal(mv, mv_acc)
    # Position 0 (I-frame) is zeroed in both modes (reference cur_pos>0 guard).
    assert (coviar_compat.load(str(path), 0, 0, coviar_compat.MV, True)
            == 0).all()
