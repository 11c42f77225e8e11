"""Pallas TPU kernel for GOP motion back-tracing — the codec's hot loop.

Computes the same accu_src recursion as `codec.accumulate.backtrace_gop`
(reference semantics coviar_data_loader.c:111-115) as ONE Pallas program:

  * the (padded) accumulator lives in VMEM across the whole GOP — TPU grid
    steps execute sequentially, so a ping-pong pair of scratch planes
    carries it with zero HBM round-trips (the XLA scan+gather formulation
    re-materializes the carry each step and its general gather lowers
    poorly on TPU);
  * motion is consumed as a per-8x8-cell MV map (MPEG-4 exports block
    motion on a macroblock grid, so the dense per-pixel map is constant on
    8x8 cells — `cell_mv_from_dense` extracts and validates this);
  * Mosaic only allows lane-dim dynamic slices at 128-aligned offsets, so
    each cell's source window is fetched by an aligned (16, 256) load and
    realigned in-register with dynamic rotates (`pltpu.roll`); results for
    the 16 cells of a 128-lane "supercell" are assembled in registers and
    written with one aligned store;
  * per-pixel source/destination bounds masks reproduce the reference's
    boundary clipping (c:105-108); 128-pixel padding keeps every load
    in-bounds for |mv| <= 56 (larger motion falls back to the XLA path);
  * payloads are bit-packed (coords (y<<16)|x, BGR (b<<16)|(g<<8)|r) so
    2 planes carry what 5 did, and each loop iteration handles a tall
    supercell (ROWS cell-rows);
  * the loop is issue-bound on per-cell fetches, so content that is
    uniform per 16x16 macroblock (MPEG-4 1MV mode — the common case)
    dispatches to a CELL=16 instantiation of the same kernel: 4x fewer
    fetches, measured 0.42 ms true kernel time per 256x320x12 GOP in
    32-GOP batches (1.05 ms at CELL=8; ~6 ms/call dispatch through the
    axon tunnel dominates small batches).  `coarsen_cell_mv` validates
    the 16x16 uniformity (clipped-zero sub-cells included) and
    `backtrace_gop_pallas` auto-dispatches.

`backtrace_gop_cells` is the jit entry; `backtrace_gop_pallas` is the
dense-map drop-in with automatic fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELL = 8
SUPER = 128          # lanes per supercell = 16 cells at CELL=8
PAD_R = 64           # row (sublane) padding: motion slack only
PAD_C = 128          # lane padding: must stay 128-aligned for stores
MAX_MV = PAD_R - CELL
ROWS = 2            # cell-rows per loop iteration (tall supercell)


def max_mv(cell=CELL):
    """Largest |mv| the kernel's padded fetch windows cover at `cell`."""
    return PAD_R - cell


def cell_mv_from_dense(mv_maps, cell=CELL):
    """Extract the per-cell MV map from dense per-pixel maps.

    Returns (cell_mv (T, H/cell, W/cell, 2) int32, ok); ok is False when a
    cell carries two different nonzero motions or |mv| exceeds
    `max_mv(cell)` (caller falls back to the XLA path).
    """
    mv = np.asarray(mv_maps, np.int32)
    t, h, w, _ = mv.shape
    assert h % cell == 0 and w % cell == 0, (h, w)
    cells = mv.reshape(t, h // cell, cell, w // cell, cell, 2)
    cells = cells.transpose(0, 1, 3, 2, 4, 5)
    flat = cells.reshape(t, h // cell, w // cell, cell * cell, 2)
    mag = np.abs(flat).sum(-1)
    pick = mag.argmax(-1)
    cell_mv = np.take_along_axis(
        flat, pick[..., None, None], axis=3)[..., 0, :]
    nonzero = mag > 0
    matches = (flat == cell_mv[..., None, :]).all(-1)
    ok = bool((matches | ~nonzero).all()) and bool(
        np.abs(cell_mv).max(initial=0) <= max_mv(cell))
    return cell_mv, ok


def coarsen_cell_mv(cell_mv, height, width, factor=2, cell=CELL):
    """Coarsen a per-cell MV grid by `factor` (8x8 cells -> 16x16).

    MPEG-4 emits one MV per 16x16 macroblock unless 4MV mode splits it, so
    most GOPs are uniform on 2x2 cell groups; the CELL=16 kernel variant
    then runs ~4x fewer per-cell fetches.  A zero sub-cell inside a moving
    group is mergeable only when it is FULLY clipped under the group's
    motion (its source window entirely out of bounds) — the kernel's
    per-pixel validity mask then reproduces it bit-exactly; a genuinely
    static sub-cell (4MV mode, 8x8 blocks) must refuse.  Returns (coarse
    (T, ncy/f, ncx/f, 2), ok); ok is False when any group mixes motions,
    the grid doesn't divide, or |mv| exceeds the coarser variant's bound.
    """
    cm = np.asarray(cell_mv, np.int32)
    t, ncy, ncx, _ = cm.shape
    if ncy % factor or ncx % factor:
        return cm, False
    g = cm.reshape(t, ncy // factor, factor, ncx // factor, factor, 2)
    gt = g.transpose(0, 1, 3, 2, 4, 5).reshape(
        t, ncy // factor, ncx // factor, factor * factor, 2)
    mag = np.abs(gt).sum(-1)
    pick = mag.argmax(-1)
    coarse = np.take_along_axis(gt, pick[..., None, None], axis=3)[..., 0, :]
    nonzero = mag > 0
    matches = (gt == coarse[..., None, :]).all(-1)
    # Sub-cell pixel origins (y0, x0) per group slot q = ry*factor + rx.
    ry = (np.arange(factor)[:, None]
          + np.zeros((factor,), np.int32)).reshape(-1)
    rx = (np.zeros((factor, 1), np.int32)
          + np.arange(factor)[None, :]).reshape(-1)
    y0 = (np.arange(ncy // factor)[None, :, None, None] * factor
          + ry[None, None, None, :]) * cell
    x0 = (np.arange(ncx // factor)[None, None, :, None] * factor
          + rx[None, None, None, :]) * cell
    mx, my = coarse[..., 0:1], coarse[..., 1:2]
    clipped_y = (y0 + cell - my <= 0) | (y0 - my >= height)
    clipped_x = (x0 + cell - mx <= 0) | (x0 - mx >= width)
    safe_zero = clipped_y | clipped_x
    ok = bool((matches | (~nonzero & safe_zero)).all()) and bool(
        np.abs(coarse).max(initial=0) <= max_mv(cell * factor))
    return coarse, ok


def cell_mv_from_blocks(blocks, n_blocks, height, width):
    """Build the kernel's per-cell MV grid straight from MV block lists.

    `blocks` (T, max_blocks, 6) int32 [src_x, src_y, dst_x, dst_y, w, h]
    with center-coordinate convention (FFmpeg AVMotionVector, identical to
    the reference's side-data input, coviar_data_loader.c:97-104);
    `n_blocks` (T,) valid-row counts.  Zero-motion blocks are already
    dropped by the native decoder.  Skips the dense per-pixel rasterization
    entirely — per-pixel boundary clipping (c:105-108) is reproduced by the
    kernel's validity mask, which `coarsen_cell_mv`'s clipped-zero analysis
    shows is equivalent cell-wise.

    Returns (cell_mv (T, H/cell, W/cell, 2) int32, cell) picking the
    largest uniform cell size (16 for pure-1MV frames, 8 when 4MV blocks
    appear), or (None, 0) when any block is unaligned to an 8-pixel grid,
    |mv| exceeds the kernel bound, or H/W don't divide — callers fall back
    to the dense host path.
    """
    blocks = np.asarray(blocks, np.int32)
    n_blocks = np.asarray(n_blocks, np.int32)
    try:
        # native twin (codec/native cv_cells_from_blocks): same validate +
        # scatter, ~20x faster — this runs per GOP on the serving hot
        # path.  cell_mv_from_blocks_np below is the executable spec and
        # the fallback; test_pallas_backtrace A/Bs the two.
        from dmcnet_tpu.codec.mpeg4 import _lib
        import ctypes

        lib = _lib()
    except Exception:
        return cell_mv_from_blocks_np(blocks, n_blocks, height, width)
    t = blocks.shape[0]
    blocks_c = np.ascontiguousarray(blocks)
    nb_c = np.ascontiguousarray(n_blocks)
    i32p = ctypes.POINTER(ctypes.c_int32)
    for cell in (16, 8):
        if height % cell or width % cell:
            continue
        grids = np.zeros((t, height // cell, width // cell, 2), np.int32)
        if lib.cv_cells_from_blocks(
                blocks_c.ctypes.data_as(i32p), nb_c.ctypes.data_as(i32p),
                t, blocks.shape[1], height, width, cell, max_mv(cell),
                grids.ctypes.data_as(i32p)):
            return grids, cell
    return None, 0


def cell_mv_from_blocks_np(blocks, n_blocks, height, width):
    """Pure-numpy `cell_mv_from_blocks`: the executable spec of
    cv_cells_from_blocks and the fallback when the native lib is absent."""
    blocks = np.asarray(blocks, np.int32)
    n_blocks = np.asarray(n_blocks, np.int32)
    t = blocks.shape[0]
    for cell in (16, 8):
        if height % cell or width % cell:
            continue
        grids = np.zeros((t, height // cell, width // cell, 2), np.int32)
        ok = True
        for ti in range(t):
            bs = blocks[ti, :n_blocks[ti]]
            if not len(bs):
                continue
            w_, h_ = bs[:, 4], bs[:, 5]
            x0 = bs[:, 2] - w_ // 2
            y0 = bs[:, 3] - h_ // 2
            val = bs[:, 2:4] - bs[:, 0:2]
            if (np.abs(val).max(initial=0) > max_mv(cell)
                    or (w_ % cell).any() or (h_ % cell).any()
                    or (x0 % cell).any() or (y0 % cell).any()
                    or (x0 < 0).any() or (y0 < 0).any()
                    or (x0 + w_ > width).any() or (y0 + h_ > height).any()):
                ok = False
                break
            # Vectorized scatter per block span (spans are 1 cell for
            # blocks == cell, else a small repeat grid; MPEG-4 blocks
            # never overlap, so order is irrelevant).
            for (bw, bh) in {(int(a), int(b))
                             for a, b in zip(w_ // cell, h_ // cell)}:
                sel = (w_ // cell == bw) & (h_ // cell == bh)
                cy = y0[sel] // cell
                cx = x0[sel] // cell
                v = val[sel]
                for dy in range(bh):
                    for dx in range(bw):
                        grids[ti, cy + dy, cx + dx] = v
        if ok:
            return grids, cell
    return None, 0


def _shift_cells_multi(specs, cmv_read, height, width, ncy, ncx,
                       cell=CELL):
    """Apply one frame's per-cell motion shift to several scratch refs.

    `specs`: list of (ref, prev_plane, cur_plane); `cmv_read(cy, cx, c)`
    reads one motion scalar (kernels differ in block rank).  Shared body of
    the accu-only and accu+warp kernels.

    Measured shape of the cost (v5e): the loop is bound by PER-ITERATION
    overhead (scalar addressing + dynamic ldst issue), not vector work —
    packing 5 shifted planes into 2 changed nothing, and a data-dependent
    uniform-motion branch saved nothing net (+5% panning, -3% random).  So
    each iteration processes a TALL supercell: `ROWS` cell-rows x 128
    lanes (ROWS*16 cells), halving the iteration count per ROWS doubling.
    """
    n_super = pl.cdiv(ncx * cell, SUPER)
    n_tall = pl.cdiv(ncy, ROWS)
    cell_rows = jax.lax.broadcasted_iota(jnp.int32, (cell, cell), 0)
    cell_cols = jax.lax.broadcasted_iota(jnp.int32, (cell, cell), 1)
    tall = ROWS * cell

    def super_body(idx, _):
        ty = idx // n_super
        sc = idx % n_super
        dy = pl.multiple_of(PAD_R + ty * tall, cell)
        dxs = pl.multiple_of(PAD_C + sc * SUPER, SUPER)

        # Per-cell motion and masks are shared across planes.
        rows_meta = []
        for r in range(ROWS):
            cy = ty * ROWS + r
            row_ok = cy < ncy
            cyc = jnp.minimum(cy, ncy - 1)
            row = []
            for k in range(SUPER // cell):
                cx = sc * (SUPER // cell) + k
                in_grid = (cx < ncx) & row_ok
                cxc = jnp.minimum(cx, ncx - 1)
                mvx = jnp.where(in_grid, cmv_read(cyc, cxc, 0), 0)
                mvy = jnp.where(in_grid, cmv_read(cyc, cxc, 1), 0)
                ys = cy * cell + cell_rows
                xs = cx * cell + cell_cols
                valid = ((ys - mvy >= 0) & (ys - mvy < height)
                         & (xs - mvx >= 0) & (xs - mvx < width)
                         & (xs < width) & in_grid)
                row.append((mvx, mvy, valid))
            rows_meta.append(row)

        for ref, prev, cur in specs:
            acc = ref[prev, pl.ds(dy, tall), pl.ds(dxs, SUPER)]
            row_strips = []
            for r, row in enumerate(rows_meta):
                dyr = pl.multiple_of(dy + r * cell, cell)
                pieces = []
                for k, (mvx, mvy, valid) in enumerate(row):
                    sy0 = dyr - mvy
                    sx0 = dxs + k * cell - mvx
                    rbase = pl.multiple_of((sy0 // cell) * cell, cell)
                    cbase = pl.multiple_of((sx0 // SUPER) * SUPER, SUPER)
                    win = ref[prev, pl.ds(rbase, 2 * cell),
                              pl.ds(cbase, 2 * SUPER)]
                    # Realign to win[sy0-rbase : +cell, sx0-cbase : +cell].
                    win = pltpu.roll(
                        win, (2 * cell - (sy0 - rbase)) % (2 * cell), 0)
                    win = pltpu.roll(
                        win, (2 * SUPER - (sx0 - cbase)) % (2 * SUPER), 1)
                    src = win[0:cell, 0:cell]
                    pieces.append(jnp.where(
                        valid, src,
                        acc[r * cell:(r + 1) * cell,
                            k * cell:(k + 1) * cell]))
                row_strips.append(jnp.concatenate(pieces, axis=1))
            ref[cur, pl.ds(dy, tall), pl.ds(dxs, SUPER)] = \
                jnp.concatenate(row_strips, axis=0) if ROWS > 1 \
                else row_strips[0]
        return 0

    jax.lax.fori_loop(0, n_tall * n_super, super_body, 0)


def _kernel(cmv_ref, out_ref, scratch, height, width, ncy, ncx,
            cell=CELL):
    """The back-trace moves VALUES without arithmetic, so both coordinate
    channels ride ONE int32 plane packed as (y << 16) | x — half the loads,
    rolls, and VMEM of separate x/y planes.  scratch: (2, hp, wp), index =
    ping-pong buffer."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
        scratch[0, PAD_R:PAD_R + height, PAD_C:PAD_C + width] = \
            (ys << 16) | xs

    @pl.when(t > 0)
    def _step():
        _shift_cells_multi(
            [(scratch, (t - 1) % 2, t % 2)],
            lambda cy, cx, c: cmv_ref[0, cy, cx, c],
            height, width, ncy, ncx, cell)

    packed = scratch[t % 2, PAD_R:PAD_R + height, PAD_C:PAD_C + width]
    out_ref[0, 0] = packed & 0xFFFF
    out_ref[0, 1] = packed >> 16


def _kernel_warp(cmv_ref, iframe_ref, out_ref, warp_ref, scratch, wscratch,
                 height, width, ncy, ncx, cell=CELL):
    """Back-trace AND carry the motion-compensated I-frame.

    W_t[p] = base[accu_t[p]] satisfies the same recursion
    W_t[p] = W_{t-1}[p - mv_t[p]], so the warped-base planes ride the same
    per-cell shifts; the accumulated residual is then just
    frame_t - W_t (computed outside, elementwise).  The moves are pure
    permutations, so the payloads are bit-packed: coordinates as
    (y << 16) | x in one int32 plane, BGR as (b << 16) | (g << 8) | r in
    another — 2 shifted planes per frame instead of 5, and ~2.5x less
    scratch VMEM.  (Planes stay int32: Mosaic cannot dynamic-rotate bf16.)

    Grid is (G, T) with T innermost: TPU iterates the grid sequentially in
    row-major order, so each GOP's frames run in order and `t == 0`
    re-initializes the VMEM accumulator for the next GOP."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
        scratch[0, PAD_R:PAD_R + height, PAD_C:PAD_C + width] = \
            (ys << 16) | xs
        wscratch[0, PAD_R:PAD_R + height, PAD_C:PAD_C + width] = \
            (iframe_ref[0, 0] << 16) | (iframe_ref[0, 1] << 8) \
            | iframe_ref[0, 2]

    @pl.when(t > 0)
    def _step():
        _shift_cells_multi(
            [(scratch, (t - 1) % 2, t % 2),
             (wscratch, (t - 1) % 2, t % 2)],
            lambda cy, cx, c: cmv_ref[0, 0, cy, cx, c],
            height, width, ncy, ncx, cell)

    packed = scratch[t % 2, PAD_R:PAD_R + height, PAD_C:PAD_C + width]
    out_ref[0, 0, 0] = packed & 0xFFFF
    out_ref[0, 0, 1] = packed >> 16
    wpacked = wscratch[t % 2, PAD_R:PAD_R + height, PAD_C:PAD_C + width]
    warp_ref[0, 0, 0] = wpacked >> 16
    warp_ref[0, 0, 1] = (wpacked >> 8) & 0xFF
    warp_ref[0, 0, 2] = wpacked & 0xFF


@functools.partial(jax.jit, static_argnames=("height", "width", "cell"))
def backtrace_gop_cells(cell_mv, height, width, cell=CELL):
    """cell_mv (T, ncy, ncx, 2) int32 -> accu_src (T, 2, H, W) int32,
    channel 0 = src_x, 1 = src_y (channels-leading; `accu_to_hwc` converts
    to the codec.accumulate layout)."""
    t, ncy, ncx, _ = cell_mv.shape
    # Lane size must cover the supercell sweep plus the widest aligned
    # source window (cbase can exceed the last supercell start by SUPER).
    wp = ((width + SUPER - 1) // SUPER) * SUPER + 2 * PAD_C + SUPER
    hp = height + 2 * PAD_R
    kernel = functools.partial(_kernel, height=height, width=width,
                               ncy=ncy, ncx=ncx, cell=cell)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, ncy, ncx, 2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, height, width),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 2, height, width), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.int32)],
    )(cell_mv)


def accu_to_hwc(accu):
    """(T, 2, H, W) -> (T, H, W, 2) matching codec.accumulate layout."""
    return jnp.transpose(accu, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("height", "width", "cell"))
def backtrace_warp_batch(cell_mv, iframes_chw, height, width, cell=CELL):
    """Batched back-trace + warped I-frame: one kernel launch for G GOPs.

    Args:
      cell_mv: (G, T, ncy, ncx, 2) int32.
      iframes_chw: (G, 3, H, W) int32 — per-GOP I-frames, channels first.

    Returns (accu (G, T, 2, H, W) int32, warped (G, T, 3, H, W) int32)
    where warped[g, t] = iframe[g][accu[g, t]] — the accumulated residual
    is frames[g, t] - warped[g, t].
    """
    g, t, ncy, ncx, _ = cell_mv.shape
    wp = ((width + SUPER - 1) // SUPER) * SUPER + 2 * PAD_C + SUPER
    hp = height + 2 * PAD_R
    kernel = functools.partial(_kernel_warp, height=height, width=width,
                               ncy=ncy, ncx=ncx, cell=cell)
    return pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            pl.BlockSpec((1, 1, ncy, ncx, 2),
                         lambda gi, ti: (gi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, height, width), lambda gi, ti: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 2, height, width),
                         lambda gi, ti: (gi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, height, width),
                         lambda gi, ti: (gi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, t, 2, height, width), jnp.int32),
            jax.ShapeDtypeStruct((g, t, 3, height, width), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.int32),
                        pltpu.VMEM((2, hp, wp), jnp.int32)],
    )(cell_mv, iframes_chw)


def backtrace_warp_gop_cells(cell_mv, iframe_chw, height, width,
                             cell=CELL):
    """Single-GOP convenience wrapper over `backtrace_warp_batch`."""
    accu, warped = backtrace_warp_batch(cell_mv[None], iframe_chw[None],
                                        height, width, cell=cell)
    return accu[0], warped[0]


@functools.partial(jax.jit, static_argnames=("height", "width", "cell"))
def backtrace_warp_batch_xla(cell_mv, iframes_chw, height, width,
                             cell=CELL):
    """Exact XLA twin of `backtrace_warp_batch` — same signature, same
    integer outputs, no Pallas.

    Use it where the Mosaic kernel can't run: non-TPU backends, and CPU
    multi-device `shard_map` programs (the TPU interpreter's per-core
    machinery deadlocks when several device programs run it concurrently
    on one host, so `pltpu.force_tpu_interpret_mode` + mesh is not an
    option).  `tests/test_pallas_backtrace.py` pins kernel == twin.
    Semantics: codec.accumulate.backtrace_gop over the cell-densified
    motion field (reference coviar_data_loader.c:97-175), with the
    kernel's per-pixel validity rule applied first: where the source
    pixel `pos - mv` falls out of bounds, motion is zero for that pixel
    at that step (the reference rasterizer never writes such pixels,
    c:105-108)."""
    from dmcnet_tpu.codec.accumulate import _gather_hw, backtrace_gop

    dense = jnp.repeat(jnp.repeat(cell_mv.astype(jnp.int32), cell, axis=2),
                       cell, axis=3)  # (G, T, H, W, 2)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    sx = xs[None, None] - dense[..., 0]
    sy = ys[None, None] - dense[..., 1]
    ok = ((sx >= 0) & (sx < width) & (sy >= 0) & (sy < height))
    dense = jnp.where(ok[..., None], dense, 0)

    def one(mv_maps, iframe_chw):
        accu_src = backtrace_gop(mv_maps)  # (T, H, W, 2) = (sx, sy)
        iframe_hwc = jnp.transpose(iframe_chw.astype(jnp.int32), (1, 2, 0))
        warped = jax.vmap(
            lambda s: _gather_hw(iframe_hwc, s[..., 0], s[..., 1]))(accu_src)
        return (jnp.transpose(accu_src, (0, 3, 1, 2)),
                jnp.transpose(warped, (0, 3, 1, 2)))

    return jax.vmap(one)(dense, iframes_chw)


def backtrace_gop_pallas(mv_maps):
    """Dense-map convenience wrapper with automatic XLA fallback."""
    from dmcnet_tpu.codec.accumulate import backtrace_gop

    mv_maps = np.asarray(mv_maps)
    _, h, w, _ = mv_maps.shape
    if h % CELL or w % CELL:
        return backtrace_gop(mv_maps)
    cell_mv, ok = cell_mv_from_dense(mv_maps)
    if not ok:
        return backtrace_gop(mv_maps)
    # 16x16-uniform motion (1MV-per-macroblock streams) runs the CELL=16
    # variant: ~4x fewer per-cell fetches in the issue-bound shift loop.
    coarse, ok16 = coarsen_cell_mv(cell_mv, h, w)
    if ok16:
        accu = backtrace_gop_cells(jnp.asarray(coarse), h, w, cell=2 * CELL)
    else:
        accu = backtrace_gop_cells(jnp.asarray(cell_mv), h, w)
    return accu_to_hwc(accu)


def gop_mv_residual_pallas(mv_maps, frames_bgr):
    """Drop-in twin of codec.accumulate.gop_mv_residual (accumulate mode):
    Pallas back-trace + XLA residual gather (accumulated sources are
    per-pixel arbitrary, outside the cell trick's reach).  ~6x faster than
    the all-XLA path on v5e (1.19 ms amortized vs 7.1 ms per 256x320x12
    GOP; ~1.0 ms true kernel time)."""
    from dmcnet_tpu.codec.accumulate import (
        accumulated_mv_from_src,
        accumulated_residual_from_src,
    )

    accu_src = backtrace_gop_pallas(mv_maps)
    mv = accumulated_mv_from_src(accu_src).at[0].set(0)
    res = accumulated_residual_from_src(
        jnp.asarray(frames_bgr), accu_src).at[0].set(0)
    return mv, res
