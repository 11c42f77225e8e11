"""Round-trip tests for the native MPEG-4 front-end.

Encode synthetic frames with the in-library MPEG-4 encoder, then decode with
the GOP reader and validate structure, motion recovery, and the coviar-compat
API surface.
"""

import numpy as np
import pytest

from dmcnet_tpu.codec import coviar_compat
from dmcnet_tpu.codec.accumulate import gop_mv_residual
from dmcnet_tpu.codec.mpeg4 import (VideoReader, encode_mpeg4, encode_video,
                                    shared_reader_cache)


def _textured_frames(rng, t, h, w, shift_per_frame=(2, 1)):
    """Frames with rich texture translating by a constant shift per frame."""
    pad = 64
    canvas = rng.integers(0, 256, size=(h + 2 * pad, w + 2 * pad, 3))
    canvas = canvas.astype(np.uint8)
    # Blur-ish: average pooling over 4x4 to make motion estimation stable.
    c = canvas.astype(np.float32)
    c = (c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2] + c[1::2, 1::2]) / 4
    canvas = np.kron(c, np.ones((2, 2, 1))).astype(np.uint8)
    frames = []
    for i in range(t):
        ox = pad + shift_per_frame[0] * i
        oy = pad + shift_per_frame[1] * i
        frames.append(canvas[oy:oy + h, ox:ox + w])
    return np.stack(frames)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    rng = np.random.default_rng(7)
    path = tmp_path_factory.mktemp("vid") / "synthetic.avi"
    frames = _textured_frames(rng, t=24, h=128, w=192)
    encode_mpeg4(path, frames, gop_size=12, bit_rate=4_000_000)
    return str(path), frames


def test_structure(video):
    path, frames = video
    with VideoReader(path) as r:
        assert r.width == 192 and r.height == 128
        assert r.num_frames == 24
        assert r.num_gops == 2
        assert r.gop_len(0) + r.gop_len(1) == 24


def test_decoded_frames_close(video):
    path, frames = video
    with VideoReader(path) as r:
        dec, _ = r.decode_gop(0)
        assert dec.shape == (r.gop_len(0), 128, 192, 3)
        err = np.abs(dec[0].astype(int) - frames[0].astype(int)).mean()
        assert err < 12.0, f"I-frame decode error too high: {err}"


def test_iframe_has_no_motion(video):
    path, _ = video
    with VideoReader(path) as r:
        _, mv_maps = r.decode_gop(0)
        assert (mv_maps[0] == 0).all()


def test_accumulated_mv_recovers_translation(video):
    """The crop window moves by (+2, +1)/frame, so scene content moves by
    (-2, -1)/frame: accumulated MV at frame t should be close to (-2t, -t)
    over interior pixels."""
    path, _ = video
    with VideoReader(path) as r:
        frames, mv_maps = r.decode_gop(0)
        mv, _ = gop_mv_residual(mv_maps, frames, accumulate=True)
        mv = np.asarray(mv)
        t = 6
        interior = mv[t, 32:-32, 32:-32]
        med_x = np.median(interior[..., 0])
        med_y = np.median(interior[..., 1])
        assert abs(med_x + 2 * t) <= 2, (med_x, -2 * t)
        assert abs(med_y + 1 * t) <= 2, (med_y, -t)


def test_residual_smaller_than_frame_diff(video):
    """Motion-compensated residual must beat the raw frame difference."""
    path, _ = video
    with VideoReader(path) as r:
        frames, mv_maps = r.decode_gop(0)
        _, res = gop_mv_residual(mv_maps, frames, accumulate=True)
        t = 6
        raw_diff = np.abs(frames[t].astype(int) - frames[0].astype(int)).mean()
        comp_diff = np.abs(np.asarray(res)[t]).mean()
        assert comp_diff < raw_diff * 0.5, (comp_diff, raw_diff)


@pytest.mark.parametrize("codec,container,codec_id", [
    ("libx264", "mp4", 27),      # H.264 — the reference datasets' original
                                 # codec before MPEG-4 re-encode
    ("mpeg2video", "avi", 2),
])
def test_generic_codec_rgb_decode(tmp_path, codec, container, codec_id):
    """rgb/iframe decode works for ANY libavcodec-supported codec, not just
    MPEG-4 re-encodes — matching the reference's cv2 `Video` class which
    plays the original H.264 files for the rgb stream
    (code/dmcnet_I3D/data/video_iterator.py:185-309)."""
    rng = np.random.default_rng(3)
    frames = _textured_frames(rng, t=24, h=128, w=192)
    path = str(tmp_path / f"clip_{codec}.{container}")
    encode_video(path, frames, codec=codec, gop_size=12,
                 bit_rate=4_000_000, container=container)
    with VideoReader(path) as r:
        assert r.codec_id == codec_id and not r.is_mpeg4
        assert r.width == 192 and r.height == 128
        assert r.num_frames == 24 and r.num_gops == 2
        dec, mv = r.decode_gop(0, with_mv=False)
        assert mv is None
        assert dec.shape == (r.gop_len(0), 128, 192, 3)
        err = np.abs(dec[0].astype(int) - frames[0].astype(int)).mean()
        assert err < 12.0, f"{codec} I-frame decode error too high: {err}"
        # P-frames decode too (full GOP, presentation order).
        err6 = np.abs(dec[6].astype(int) - frames[6].astype(int)).mean()
        assert err6 < 16.0, err6
        # MV/residual semantics are MPEG-4-only: asking for them on this
        # stream must fail LOUD (H.264 multi-ref MVs would silently
        # violate the coviar accumulate math), pointing at the transcoder.
        with pytest.raises(ValueError, match="MPEG-4"):
            r.decode_gop(0)  # default with_mv=True
        with pytest.raises(ValueError, match="MPEG-4"):
            r.decode_gop_blocks(0)


def test_shared_reader_cache_single_instance(video):
    """All access paths (compat shim, datasets) key into ONE process-wide
    reader cache — no double-open / double-buffer of the same file."""
    path, _ = video
    cache = shared_reader_cache()
    coviar_compat.get_num_frames(path)  # populates via the compat shim
    assert cache.get(path) is coviar_compat._reader(path)
    before = len(cache)
    coviar_compat.load(path, 0, 1, coviar_compat.MV, True)
    assert len(cache) == before  # no second reader for the same path


def test_coviar_compat_api(video):
    path, _ = video
    assert coviar_compat.get_num_frames(path) == 24
    assert coviar_compat.get_num_gops(path) == 2
    mv = coviar_compat.load(path, 0, 3, coviar_compat.MV, True)
    assert mv.shape == (128, 192, 2) and mv.dtype == np.int32
    res = coviar_compat.load(path, 0, 3, coviar_compat.RESIDUAL, True)
    assert res.shape == (128, 192, 3) and res.dtype == np.int32
    iframe = coviar_compat.load(path, 1, 0, coviar_compat.IFRAME, True)
    assert iframe.shape == (128, 192, 3) and iframe.dtype == np.uint8


def test_decode_gop_blocks_keep_mask(video):
    """keep=<indices>: kept rows bit-match the full decode, skipped rows
    come back zero (their YUV->BGR conversion never ran), and the MV block
    lists are identical — motion covers every frame regardless."""
    path, _ = video
    with VideoReader(path) as r:
        full, _, blocks_f, nb_f = r.decode_gop_blocks(0, skip_dense=True)
        t = full.shape[0]
        kept, _, blocks_k, nb_k = r.decode_gop_blocks(
            0, skip_dense=True, keep=[0, 5, t - 1])
        np.testing.assert_array_equal(nb_f, nb_k)
        np.testing.assert_array_equal(blocks_f, blocks_k)
        for i in range(t):
            if i in (0, 5, t - 1):
                np.testing.assert_array_equal(kept[i], full[i])
            else:
                assert not kept[i].any(), f"frame {i} should be zero"
        # bool-mask spelling yields the same result
        mask = np.zeros(t, bool)
        mask[[0, 5, t - 1]] = True
        kept2, _, _, _ = r.decode_gop_blocks(0, skip_dense=True, keep=mask)
        np.testing.assert_array_equal(kept, kept2)
