"""Pallas back-tracing kernel vs the NumPy golden model (interpret mode on
CPU; the same code compiles on TPU)."""

import numpy as np
import pytest

from dmcnet_tpu.codec.semantics import accumulate_gop_numpy
from dmcnet_tpu.codec.synthetic import dense_mv_maps, synthetic_gop
from dmcnet_tpu.ops import pallas_backtrace as pb


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas_call in interpreter mode for CPU testing."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_cell_mv_extraction(rng):
    blocks, _ = synthetic_gop(rng, num_frames=4, height=64, width=96,
                              block_size=16, max_motion=10)
    dense = dense_mv_maps(blocks, 64, 96)
    cell_mv, ok = pb.cell_mv_from_dense(dense)
    assert ok
    assert cell_mv.shape == (4, 8, 12, 2)
    # Interior 16x16 blocks put the same value in their four 8x8 cells.
    for b in blocks[1]:
        if b.val == (0, 0):
            continue
        cy, cx = (b.dst_y - 8) // 8, (b.dst_x - 8) // 8
        if 1 <= cy < 7 and 1 <= cx < 11:
            assert tuple(cell_mv[1, cy, cx]) == b.val


def test_kernel_matches_golden(rng):
    blocks, _ = synthetic_gop(rng, num_frames=5, height=64, width=96,
                              block_size=16, max_motion=10)
    dense = dense_mv_maps(blocks, 64, 96)
    accu = np.asarray(pb.backtrace_gop_pallas(dense))
    for t in range(5):
        golden = accumulate_gop_numpy(blocks, 64, 96, t)
        np.testing.assert_array_equal(accu[t], golden)


def test_kernel_boundary_motion(rng):
    """Strong motion near borders exercises the per-pixel clipping masks."""
    blocks, _ = synthetic_gop(rng, num_frames=4, height=48, width=64,
                              block_size=16, max_motion=20)
    dense = dense_mv_maps(blocks, 48, 64)
    accu = np.asarray(pb.backtrace_gop_pallas(dense))
    for t in range(4):
        golden = accumulate_gop_numpy(blocks, 48, 64, t)
        np.testing.assert_array_equal(accu[t], golden)


def test_full_mv_residual_parity(rng):
    from dmcnet_tpu.codec.semantics import load_like_coviar_numpy

    blocks, frames = synthetic_gop(rng, num_frames=4, height=64, width=96,
                                   block_size=16, max_motion=10)
    dense = dense_mv_maps(blocks, 64, 96)
    mv, res = pb.gop_mv_residual_pallas(dense, frames)
    for t in range(4):
        np.testing.assert_array_equal(
            np.asarray(mv)[t],
            load_like_coviar_numpy(blocks, frames, t, "mv", True))
        np.testing.assert_array_equal(
            np.asarray(res)[t],
            load_like_coviar_numpy(blocks, frames, t, "residual", True))


def test_warp_kernel_parity(rng):
    """Accu + warped-I-frame kernel: residual = frame - warped must match
    the golden residual."""
    import jax.numpy as jnp

    from dmcnet_tpu.codec.semantics import load_like_coviar_numpy

    blocks, frames = synthetic_gop(rng, num_frames=4, height=64, width=96,
                                   block_size=16, max_motion=10)
    dense = dense_mv_maps(blocks, 64, 96)
    cell_mv, ok = pb.cell_mv_from_dense(dense)
    assert ok
    iframe = jnp.asarray(frames[0].transpose(2, 0, 1), jnp.int32)
    accu, warped = pb.backtrace_warp_gop_cells(
        jnp.asarray(cell_mv), iframe, 64, 96)
    warped = np.asarray(warped).transpose(0, 2, 3, 1)
    for t in range(1, 4):
        res = frames[t].astype(np.int32) - warped[t].astype(np.int32)
        golden = load_like_coviar_numpy(blocks, frames, t, "residual", True)
        np.testing.assert_array_equal(res, golden)
        golden_accu = accumulate_gop_numpy(blocks, 64, 96, t)
        np.testing.assert_array_equal(
            np.asarray(accu)[t].transpose(1, 2, 0), golden_accu)


def test_coarsen_cell_mv(rng):
    blocks, _ = synthetic_gop(rng, num_frames=4, height=64, width=96,
                              block_size=16, max_motion=10)
    dense = dense_mv_maps(blocks, 64, 96)
    cell_mv, ok = pb.cell_mv_from_dense(dense)
    assert ok
    coarse, ok16 = pb.coarsen_cell_mv(cell_mv, 64, 96)
    assert ok16 and coarse.shape == (4, 4, 6, 2)
    # 4MV-style split (different MVs inside one macroblock) must refuse.
    mixed = np.array(cell_mv)
    mixed[1, 0, 0] = (5, 0)
    mixed[1, 0, 1] = (-5, 0)
    _, ok16 = pb.coarsen_cell_mv(mixed, 64, 96)
    assert not ok16
    # |mv| beyond the CELL=16 window bound must refuse too.
    big = np.array(cell_mv)
    big[1, 1, 1] = big[1, 1, 0] = (pb.max_mv(16) + 1, 0)
    big[1, 2, 0] = big[1, 2, 1] = (pb.max_mv(16) + 1, 0)
    _, ok16 = pb.coarsen_cell_mv(big, 64, 96)
    assert not ok16


def test_kernel_cell16_matches_cell8_and_golden(rng):
    """The CELL=16 variant (what 1MV-per-macroblock streams dispatch to)
    must agree bit-for-bit with the CELL=8 kernel and the golden model."""
    import jax.numpy as jnp

    from dmcnet_tpu.codec.semantics import load_like_coviar_numpy

    blocks, frames = synthetic_gop(rng, num_frames=5, height=64, width=128,
                                   block_size=16, max_motion=12)
    dense = dense_mv_maps(blocks, 64, 128)
    cell_mv, ok = pb.cell_mv_from_dense(dense)
    assert ok
    coarse, ok16 = pb.coarsen_cell_mv(cell_mv, 64, 128)
    assert ok16
    accu8 = np.asarray(pb.backtrace_gop_cells(jnp.asarray(cell_mv), 64, 128))
    accu16 = np.asarray(pb.backtrace_gop_cells(jnp.asarray(coarse), 64, 128,
                                               cell=16))
    np.testing.assert_array_equal(accu16, accu8)
    for t in range(5):
        golden = accumulate_gop_numpy(blocks, 64, 128, t)
        np.testing.assert_array_equal(accu16[t].transpose(1, 2, 0), golden)
    # warp variant at CELL=16: residual parity against the golden loader
    iframe = jnp.asarray(frames[0].transpose(2, 0, 1), jnp.int32)
    _, warped = pb.backtrace_warp_gop_cells(
        jnp.asarray(coarse), iframe, 64, 128, cell=16)
    warped = np.asarray(warped).transpose(0, 2, 3, 1)
    for t in range(1, 5):
        res = frames[t].astype(np.int32) - warped[t].astype(np.int32)
        golden = load_like_coviar_numpy(blocks, frames, t, "residual", True)
        np.testing.assert_array_equal(res, golden)


def test_xla_twin_matches_warp_kernel(rng):
    """backtrace_warp_batch_xla must be bit-identical to the Mosaic warp
    kernel — it is the implementation serving uses on non-TPU backends
    and in CPU mesh tests (the TPU interpreter is not multi-device
    safe), so this equivalence is what makes those tests cover the
    sharded kernel path on real TPUs."""
    import jax.numpy as jnp

    cms, ifs = [], []
    for g in range(3):
        blocks, frames = synthetic_gop(rng, num_frames=4, height=48,
                                       width=64, block_size=16,
                                       max_motion=20)
        dense = dense_mv_maps(blocks, 48, 64)
        cell_mv, ok = pb.cell_mv_from_dense(dense)
        assert ok
        cms.append(cell_mv)
        ifs.append(frames[0].transpose(2, 0, 1).astype(np.int32))
    cm = jnp.asarray(np.stack(cms))
    ifr = jnp.asarray(np.stack(ifs))
    accu_k, warp_k = pb.backtrace_warp_batch(cm, ifr, 48, 64)
    accu_x, warp_x = pb.backtrace_warp_batch_xla(cm, ifr, 48, 64)
    np.testing.assert_array_equal(np.asarray(accu_x), np.asarray(accu_k))
    np.testing.assert_array_equal(np.asarray(warp_x), np.asarray(warp_k))


def test_fallback_on_inconsistent_cells(rng):
    dense = np.zeros((3, 16, 16, 2), np.int32)
    dense[1, 0, 0] = (1, 0)  # two different nonzero values in one cell
    dense[1, 0, 1] = (2, 0)
    _, ok = pb.cell_mv_from_dense(dense)
    assert not ok
    out = np.asarray(pb.backtrace_gop_pallas(dense))  # XLA fallback
    assert out.shape == (3, 16, 16, 2)


def test_kernel_uniform_panning_motion_parity():
    """Uniform panning-motion parity: whole 128-lane supercells share one
    MV, exercising the kernel's general path on perfectly coherent motion
    at width >= 2 supercells (the other tests use width 96 and never span
    multiple supercells).  A dedicated uniform-motion fast path was
    measured slower and removed (see pallas_backtrace.py); this input
    class must still match golden exactly."""
    from dmcnet_tpu.codec.synthetic import MVBlock

    H, W, T = 64, 256, 4
    pans = [(0, 0), (5, -3), (-7, 2), (16, 8)]
    block_lists = [[]]
    for t in range(1, T):
        vx, vy = pans[t]
        blocks = []
        for by in range(H // 16):
            for bx in range(W // 16):
                dx, dy = bx * 16 + 8, by * 16 + 8
                blocks.append(MVBlock(src_x=dx - vx, src_y=dy - vy,
                                      dst_x=dx, dst_y=dy, w=16, h=16))
        block_lists.append(blocks)
    dense = dense_mv_maps(block_lists, H, W)
    accu = np.asarray(pb.backtrace_gop_pallas(dense))
    for t in range(T):
        golden = accumulate_gop_numpy(block_lists, H, W, t)
        np.testing.assert_array_equal(accu[t], golden)


def test_warp_kernel_uniform_motion():
    """Same panning scenario through the warp (accu+residual) kernel."""
    import jax.numpy as jnp

    from dmcnet_tpu.codec.semantics import load_like_coviar_numpy
    from dmcnet_tpu.codec.synthetic import MVBlock

    rng = np.random.default_rng(9)
    H, W, T = 64, 256, 3
    frames = (rng.integers(0, 256, size=(T, H, W, 3))).astype(np.uint8)
    pans = [(0, 0), (4, 2), (-6, -5)]
    block_lists = [[]]
    for t in range(1, T):
        vx, vy = pans[t]
        block_lists.append([
            MVBlock(src_x=bx * 16 + 8 - vx, src_y=by * 16 + 8 - vy,
                    dst_x=bx * 16 + 8, dst_y=by * 16 + 8, w=16, h=16)
            for by in range(H // 16) for bx in range(W // 16)])
    dense = dense_mv_maps(block_lists, H, W)
    cell_mv, ok = pb.cell_mv_from_dense(dense)
    assert ok
    iframe = jnp.asarray(frames[0].transpose(2, 0, 1), jnp.int32)
    accu, warped = pb.backtrace_warp_gop_cells(
        jnp.asarray(cell_mv), iframe, H, W)
    warped = np.asarray(warped).transpose(0, 2, 3, 1)
    for t in range(1, T):
        res = frames[t].astype(np.int32) - warped[t].astype(np.int32)
        golden = load_like_coviar_numpy(block_lists, frames, t, "residual",
                                        True)
        np.testing.assert_array_equal(res, golden)
        golden_accu = accumulate_gop_numpy(block_lists, H, W, t)
        np.testing.assert_array_equal(
            np.asarray(accu)[t].transpose(1, 2, 0), golden_accu)


def test_cells_from_blocks_native_matches_numpy_spec(rng):
    """cv_cells_from_blocks (native, serving hot path) == the numpy
    executable spec, on valid AND disqualifying block lists (misaligned
    origins, out-of-range motion, 16- vs 8-cell block mixes)."""
    h, w = 128, 192
    for trial in range(200):
        nb = rng.integers(0, 6, size=(3,)).astype(np.int32)
        bl = np.zeros((3, 8, 6), np.int32)
        for ti in range(3):
            for i in range(nb[ti]):
                cell = int(rng.choice([8, 16]))
                x0 = int(rng.integers(-1, w // cell)) * cell
                y0 = int(rng.integers(0, h // cell)) * cell
                if rng.random() < 0.25:
                    x0 += int(rng.integers(1, 8))  # misaligned origin
                vx = int(rng.integers(-60, 61))   # sometimes > max_mv
                vy = int(rng.integers(-12, 13))
                bl[ti, i] = [x0 + cell // 2 - vx, y0 + cell // 2 - vy,
                             x0 + cell // 2, y0 + cell // 2, cell, cell]
        a, ca = pb.cell_mv_from_blocks(bl, nb, h, w)
        b, cb = pb.cell_mv_from_blocks_np(bl, nb, h, w)
        assert ca == cb, (trial, ca, cb)
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(a, b)
