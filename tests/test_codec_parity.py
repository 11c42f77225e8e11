"""Bit-parity of the fused JAX GOP kernels against the NumPy golden model.

The golden model (`dmcnet_tpu.codec.semantics`) mirrors the reference C
extension loop-for-loop (coviar_data_loader.c:71-177); these tests prove the
device-side dense-map/scan formulation computes identical integers.
"""

import numpy as np
import pytest

from dmcnet_tpu.codec import (
    accumulate_gop_numpy,
    backtrace_gop,
    gop_mv_residual,
    load_like_coviar_numpy,
    rasterize_blocks,
)
from dmcnet_tpu.codec.semantics import MVBlock, _identity_src
from dmcnet_tpu.codec.synthetic import dense_mv_maps, synthetic_gop


def test_rasterize_overlap_last_writer_wins():
    h = w = 32
    b1 = MVBlock(src_x=6, src_y=8, dst_x=8, dst_y=8, w=16, h=16)
    b2 = MVBlock(src_x=12, src_y=8, dst_x=8, dst_y=8, w=16, h=16)
    m = rasterize_blocks([b1, b2], h, w)
    assert (m[0:16, 0:16, 0] == -4).all()  # b2 overwrote b1's +2
    assert (m[0:16, 0:16, 1] == 0).all()
    assert (m[16:, :, :] == 0).all()


def test_rasterize_boundary_clipping():
    h = w = 32
    # dst centre near the left edge: src pixels would be negative for part of
    # the block; those dst pixels must stay zero (reference c:105-108).
    b = MVBlock(src_x=2, src_y=16, dst_x=8, dst_y=16, w=16, h=16)
    m = rasterize_blocks([b], h, w)
    # offsets -8..7 → dst x 0..15, src x -6..9: src < 0 for dst x < 6.
    assert (m[8:24, 0:6, 0] == 0).all()
    assert (m[8:24, 6:16, 0] == 6).all()


def test_backtrace_matches_numpy(rng):
    blocks, frames = synthetic_gop(rng, num_frames=6, height=48, width=64)
    mv_maps = dense_mv_maps(blocks, 48, 64)
    accu = np.asarray(backtrace_gop(mv_maps))
    for t in range(6):
        golden = accumulate_gop_numpy(blocks, 48, 64, t)
        np.testing.assert_array_equal(accu[t], golden)


@pytest.mark.parametrize("accumulate", [True, False])
@pytest.mark.parametrize("representation", ["mv", "residual"])
def test_load_parity(rng, representation, accumulate):
    blocks, frames = synthetic_gop(rng, num_frames=5, height=48, width=64)
    mv_maps = dense_mv_maps(blocks, 48, 64)
    mv, res = gop_mv_residual(mv_maps, frames, accumulate=accumulate)
    mv, res = np.asarray(mv), np.asarray(res)
    for t in range(5):
        golden = load_like_coviar_numpy(blocks, frames, t, representation,
                                        accumulate)
        got = mv[t] if representation == "mv" else res[t]
        np.testing.assert_array_equal(got, golden)


def test_identity_when_no_motion(rng):
    _, frames = synthetic_gop(rng, num_frames=4, height=32, width=32,
                              moving_fraction=0.0)
    mv_maps = np.zeros((4, 32, 32, 2), np.int32)
    mv, res = gop_mv_residual(mv_maps, frames, accumulate=True)
    assert (np.asarray(mv) == 0).all()
    # Residual degenerates to plain frame difference vs the I-frame.
    for t in range(1, 4):
        np.testing.assert_array_equal(
            np.asarray(res)[t],
            frames[t].astype(np.int32) - frames[0].astype(np.int32))


def test_identity_src_layout():
    ident = _identity_src(4, 6)
    assert ident[2, 5, 0] == 5 and ident[2, 5, 1] == 2  # (x, y) channels


def test_pos0_zeroed(rng):
    blocks, frames = synthetic_gop(rng, num_frames=3, height=32, width=32)
    mv_maps = dense_mv_maps(blocks, 32, 32)
    mv, res = gop_mv_residual(mv_maps, frames, accumulate=True)
    assert (np.asarray(mv)[0] == 0).all()
    assert (np.asarray(res)[0] == 0).all()


@pytest.mark.parametrize("accumulate", [True, False])
def test_native_host_accumulate_parity(rng, accumulate):
    """C++ cv_accumulate_gop vs the vectorized NumPy twin (which is itself
    golden-tested above)."""
    from dmcnet_tpu.codec.host_accumulate import (
        gop_mv_residual_native,
        gop_mv_residual_numpy,
    )

    blocks, frames = synthetic_gop(rng, num_frames=6, height=48, width=64)
    dense = dense_mv_maps(blocks, 48, 64).astype(np.int16)
    a_mv, a_res = gop_mv_residual_numpy(dense, frames, accumulate)
    b_mv, b_res = gop_mv_residual_native(dense, frames, accumulate)
    np.testing.assert_array_equal(a_mv, b_mv)
    np.testing.assert_array_equal(a_res, b_res)


@pytest.mark.parametrize("accumulate", [True, False])
@pytest.mark.parametrize("bound", [None, 20])
def test_native_u8_encode_parity(rng, accumulate, bound):
    """cv_accumulate_gop_u8 must match accumulate + the reference's numpy
    encode chain (min-max truncation, +128 clip; dataset.py:195-213)."""
    from dmcnet_tpu.codec.host_accumulate import (
        gop_mv_residual_numpy,
        gop_mv_residual_u8,
    )

    blocks, frames = synthetic_gop(rng, num_frames=6, height=48, width=64)
    dense = dense_mv_maps(blocks, 48, 64).astype(np.int16)
    mv, res = gop_mv_residual_numpy(dense, frames, accumulate)
    if bound:
        mv_ref = (mv.astype(np.float64) * (127.5 / bound)).astype(np.int32)
    else:
        mv_ref = mv
    mv_ref = np.clip(mv_ref + 128, 0, 255).astype(np.uint8)
    res_ref = np.clip(res + 128, 0, 255).astype(np.uint8)
    mv_u8, res_u8 = gop_mv_residual_u8(dense, frames, accumulate, bound)
    np.testing.assert_array_equal(mv_u8, mv_ref)
    np.testing.assert_array_equal(res_u8, res_ref)


def test_batched_vmap(rng):
    import jax

    gops = [synthetic_gop(rng, num_frames=4, height=32, width=32)
            for _ in range(3)]
    mv_maps = np.stack([dense_mv_maps(b, 32, 32) for b, _ in gops])
    frames = np.stack([f for _, f in gops])
    bmv, bres = jax.vmap(lambda m, f: gop_mv_residual(m, f, accumulate=True))(
        mv_maps, frames)
    for i, (blocks, fr) in enumerate(gops):
        mv, res = gop_mv_residual(mv_maps[i], fr, accumulate=True)
        np.testing.assert_array_equal(np.asarray(bmv)[i], np.asarray(mv))
        np.testing.assert_array_equal(np.asarray(bres)[i], np.asarray(res))
