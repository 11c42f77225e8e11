"""Serving API: whole-video prediction on a synthetic file."""

import numpy as np

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4


def _encode_panning(path, rng, n=26, h=64, w=96, gop=12):
    pad = 40
    canvas = (rng.integers(0, 256, size=(h + 2 * pad + 30,
                                         w + 2 * pad + 60, 3))
              // 8 * 8).astype(np.uint8)
    frames = np.stack([canvas[pad + i:pad + i + h,
                              pad + 2 * i:pad + 2 * i + w]
                       for i in range(n)])
    encode_mpeg4(path, frames, gop_size=gop, bit_rate=2_000_000)


def _make_predictor(num_class=7, hw=64, **kwargs):
    import jax
    import jax.numpy as jnp

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.serving import DMCPredictor

    model = DMCNet(num_class=num_class, num_segments=1,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 1, hw, hw, 2)),
                           jnp.zeros((1, 1, hw, hw, 3)), train=False)
    return DMCPredictor(variables["params"],
                        variables.get("batch_stats", {}),
                        num_class=num_class, input_size=hw, **kwargs)


def test_predict_video(tmp_path):
    import jax

    from dmcnet_tpu.serving import DMCPredictor
    from dmcnet_tpu.models import DMCNet
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    pad = 40
    canvas = (rng.integers(0, 256, size=(64 + 2 * pad + 30,
                                         96 + 2 * pad + 60, 3))
              // 8 * 8).astype(np.uint8)
    frames = np.stack([canvas[pad + i:pad + i + 64,
                              pad + 2 * i:pad + 2 * i + 96]
                       for i in range(26)])
    path = tmp_path / "v.avi"
    encode_mpeg4(path, frames, gop_size=12, bit_rate=2_000_000)

    model = DMCNet(num_class=7, num_segments=1,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    hw = 64
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 1, hw, hw, 2)),
                           jnp.zeros((1, 1, hw, hw, 3)), train=False)
    pred = DMCPredictor(variables["params"],
                        variables.get("batch_stats", {}), num_class=7,
                        input_size=hw)
    scores = pred.predict_video(str(path))
    assert scores.shape == (7,)
    assert np.isfinite(scores).all()

    # Packed and unpacked paths agree on the argmax-level output.
    pred_np = DMCPredictor(variables["params"],
                           variables.get("batch_stats", {}), num_class=7,
                           input_size=hw, pack=False)
    scores2 = pred_np.predict_video(str(path))
    np.testing.assert_allclose(scores, scores2, atol=0.05)


def test_device_backtrace_bit_exact(tmp_path):
    """Device GOP program (block lists -> Pallas back-trace -> u8 encode)
    vs the native host accumulate (cv_accumulate_gop_u8): bit-identical
    mv_u8 / res_u8 on every P-frame of every GOP of a panning clip that
    exercises boundary clipping."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from dmcnet_tpu.codec.host_accumulate import gop_mv_residual_u8
    from dmcnet_tpu.codec.mpeg4 import VideoReader
    from dmcnet_tpu.ops.pallas_backtrace import cell_mv_from_blocks

    rng = np.random.default_rng(3)
    path = tmp_path / "v.avi"
    _encode_panning(str(path), rng)
    pred = _make_predictor()

    checked = 0
    with VideoReader(str(path)) as reader:
        h, w = reader.height, reader.width
        for g in range(reader.num_gops):
            frames, mv_maps, blocks, n_blocks = reader.decode_gop_blocks(g)
            if len(frames) < 2:
                continue
            mv_host, res_host = gop_mv_residual_u8(mv_maps, frames, True, 20)
            cm, cell = cell_mv_from_blocks(blocks, n_blocks, h, w)
            assert cm is not None, f"gop {g} should qualify"
            t = len(frames)
            picks = np.arange(1, t, dtype=np.int32)
            fn = pred._gop_program(1, t, h, w, cell, t - 1)
            buf = np.concatenate([
                (cm[None] + 128).astype(np.uint8).ravel(),
                frames[None, 0].ravel(),
                pred._center_crop(frames[picks])[None].ravel(),
                picks[None].astype(np.uint8).ravel()])
            with pltpu.force_tpu_interpret_mode():
                _, mv_dev, res_dev = fn(jnp.asarray(buf))
            np.testing.assert_array_equal(
                np.asarray(mv_dev)[0], pred._center_crop(mv_host[picks]))
            np.testing.assert_array_equal(
                np.asarray(res_dev)[0], pred._center_crop(res_host[picks]))
            checked += 1
    assert checked >= 2


def test_predict_video_device_vs_host(tmp_path):
    """End-to-end scores agree between the device-backtrace and host
    backends; "auto" without a Pallas-capable backend degrades to host."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    path = tmp_path / "v.avi"
    _encode_panning(str(path), rng)
    pred = _make_predictor()

    with pltpu.force_tpu_interpret_mode():
        s_dev = pred.predict_video(str(path), backend="device")
    s_host = pred.predict_video(str(path), backend="host")
    assert s_dev.shape == s_host.shape == (7,)
    np.testing.assert_allclose(s_dev, s_host, atol=0.05)


def test_predict_videos_batched(tmp_path):
    """Batched device inference chunks GOPs of many videos into shared
    device calls; scores match the per-video paths."""
    from jax.experimental.pallas import tpu as pltpu

    paths = []
    for i in range(3):
        p = tmp_path / f"v{i}.avi"
        _encode_panning(str(p), np.random.default_rng(10 + i),
                        n=14 + 12 * i)
        paths.append(str(p))
    pred = _make_predictor()

    with pltpu.force_tpu_interpret_mode():
        batched = pred.predict_videos(paths, chunk_gops=4)
        single = [pred.predict_video(p, backend="device") for p in paths]
    for b, s in zip(batched, single):
        np.testing.assert_allclose(b, s, atol=1e-4)
    host = [pred.predict_video(p, backend="host") for p in paths]
    for b, hsc in zip(batched, host):
        np.testing.assert_allclose(b, hsc, atol=0.05)


def test_predict_videos_tail_chunk_right_sized(tmp_path, monkeypatch):
    """A ragged tail flush dispatches at the smallest covering
    `_chunk_ladder` bucket, NOT the full chunk_gops: under the default
    chunk_gops=64 a 2-GOP video used to ship a 64-row buffer (16x the
    H2D bytes for zero extra scores).  Scores are unchanged."""
    from jax.experimental.pallas import tpu as pltpu

    from dmcnet_tpu.serving import DMCPredictor

    p = str(tmp_path / "v.avi")
    _encode_panning(p, np.random.default_rng(40), n=26)  # 2 real GOPs
    pred = _make_predictor()
    assert pred._chunk_ladder(64) == [4, 8, 16, 32, 64]
    assert pred._chunk_ladder(24) == [4, 8, 16, 24]

    dispatched = []
    orig = DMCPredictor._gop_program_impl

    def spy(self, g, *a):
        dispatched.append(g)
        return orig(self, g, *a)

    monkeypatch.setattr(DMCPredictor, "_gop_program_impl", spy)
    with pltpu.force_tpu_interpret_mode():
        batched = pred.predict_videos([p], chunk_gops=64)
    assert dispatched == [4]
    host = pred.predict_video(p, backend="host")
    np.testing.assert_allclose(batched[0], host, atol=0.05)


def test_predict_videos_mixed_geometry_and_fallback(tmp_path, monkeypatch):
    """predict_videos compiles one GOP program per (h, w) geometry group
    and, under backend="auto", falls back to the host-accumulate path for
    exactly the videos whose streams disqualify — scores stay aligned
    with `paths` across both groups and the fallback."""
    from jax.experimental.pallas import tpu as pltpu

    from dmcnet_tpu.serving import DMCPredictor

    p_a = str(tmp_path / "a.avi")
    _encode_panning(p_a, np.random.default_rng(30), n=14)
    p_b = str(tmp_path / "b.avi")
    _encode_panning(p_b, np.random.default_rng(31), n=14, h=48, w=64)
    p_c = str(tmp_path / "c.avi")
    _encode_panning(p_c, np.random.default_rng(32), n=26)
    pred = _make_predictor()

    orig = DMCPredictor._gather_video_device

    def gather(self, path, fpg, segments=None):
        return None if path == p_c else orig(self, path, fpg,
                                             segments=segments)

    monkeypatch.setattr(DMCPredictor, "_gather_video_device", gather)
    with pltpu.force_tpu_interpret_mode():
        batched = pred.predict_videos([p_a, p_b, p_c], chunk_gops=4)
    host = [pred.predict_video(p, backend="host")
            for p in (p_a, p_b, p_c)]
    for b, hsc in zip(batched, host):
        np.testing.assert_allclose(b, hsc, atol=0.05)
    # the disqualified video took the host path exactly
    np.testing.assert_allclose(batched[2], host[2], atol=1e-6)


def test_predict_mesh_sharded_matches_single(tmp_path):
    """Serving scale-out: a predictor given a mesh shards clip batches
    (host path) and GOP batches (device-backtrace path) across devices;
    scores must match the single-device predictor on both backends.

    The device-backend comparison runs both predictors on the XLA
    back-trace twin: the TPU interpreter deadlocks when several CPU
    device programs run it concurrently (1-core host), and
    test_pallas_backtrace.py already pins twin == Mosaic kernel, so the
    chain covers the sharded kernel path on real TPUs."""
    from dmcnet_tpu.ops.pallas_backtrace import backtrace_warp_batch_xla
    from dmcnet_tpu.parallel import make_mesh

    paths = []
    for i in range(2):
        p = tmp_path / f"v{i}.avi"
        _encode_panning(str(p), np.random.default_rng(20 + i),
                        n=14 + 12 * i)
        paths.append(str(p))
    pred = _make_predictor(backtrace_impl=backtrace_warp_batch_xla)
    pred_mesh = _make_predictor(mesh=make_mesh(),
                                backtrace_impl=backtrace_warp_batch_xla)

    # atol: the folded-normalize bias PLANE (ops/packed_generator.py
    # input_affine) is a large spatial constant whose add changes XLA's
    # fusion layout under pjit vs single-device, perturbing bf16 conv
    # rounding by one half-ULP on O(1) logits (~8e-3); without the fold
    # the two programs are bit-identical.  1e-2 still fails loudly on any
    # real divergence (wrong shard math is orders of magnitude bigger).
    for p in paths:
        np.testing.assert_allclose(
            pred_mesh.predict_video(p, backend="host"),
            pred.predict_video(p, backend="host"), atol=1e-2)
    single = [pred.predict_video(p, backend="device") for p in paths]
    sharded = [pred_mesh.predict_video(p, backend="device")
               for p in paths]
    batched = pred_mesh.predict_videos(paths, chunk_gops=4)
    for a, b, c in zip(sharded, single, batched):
        np.testing.assert_allclose(a, b, atol=1e-2)
        np.testing.assert_allclose(c, b, atol=1e-2)


def test_predict_videos_threaded_gather(tmp_path):
    """host_workers threads the per-video gather (GIL-free native decode);
    scores are bit-identical to the serial gather."""
    paths = []
    for i in range(4):
        p = tmp_path / f"tw{i}.avi"
        _encode_panning(str(p), np.random.default_rng(70 + i),
                        n=14 + 6 * (i % 2))
        paths.append(str(p))
    pred = _make_predictor()
    serial = pred.predict_videos(paths, chunk_gops=4)
    threaded = pred.predict_videos(paths, chunk_gops=4, host_workers=4)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)


def test_warmup_precompiles(tmp_path):
    """warmup() populates the GOP-program cache so live requests with the
    same geometry never pay a compile."""
    pred = _make_predictor()
    before = pred._gop_program.cache_info().currsize
    pred.warmup(geometries=((64, 96),), t=12, cell=16, chunk_gops=4,
                host_buckets=(4,))
    info = pred._gop_program.cache_info()
    assert info.currsize == before + 1
    hits = info.hits
    pred._gop_program(4, 12, 64, 96, 16, 3)
    assert pred._gop_program.cache_info().hits == hits + 1


def test_warmup_under_mesh(tmp_path):
    """warmup on a mesh predictor compiles the sharded GOP program and the
    sharded classifier bucket without error, and the warmed key is the one
    predict_videos requests."""
    from dmcnet_tpu.parallel import make_mesh

    pred = _make_predictor(mesh=make_mesh())
    pred.warmup(geometries=((64, 96, 12, 16),), chunk_gops=8,
                host_buckets=(8,))
    info = pred._gop_program.cache_info()
    assert info.currsize >= 1
    hits = info.hits
    g = -(-8 // pred._gop_quant) * pred._gop_quant
    pred._gop_program(g, 12, 64, 96, 16, 3)
    assert pred._gop_program.cache_info().hits == hits + 1


def test_predict_video_segments_protocol(tmp_path):
    """segments=N (the reference 25-segment TSN test protocol,
    test.py:48): the device-backtrace and host-accumulate paths agree,
    short videos dedupe repeated picks into weights (score == the exact
    protocol average), and only the picked GOPs are decoded."""
    from jax.experimental.pallas import tpu as pltpu

    path = str(tmp_path / "v.avi")
    _encode_panning(path, np.random.default_rng(81), n=38)
    pred = _make_predictor()

    host = pred.predict_video(path, backend="host", segments=7)
    with pltpu.force_tpu_interpret_mode():
        dev = pred.predict_video(path, backend="device", segments=7)
    np.testing.assert_allclose(dev, host, atol=0.05)

    # segments >> P-frames: duplicate picks -> weights; still well-formed
    many = pred.predict_video(path, backend="host", segments=100)
    assert np.isfinite(many).all()

    # a protocol pick set decodes strictly fewer GOPs than the full scan
    from dmcnet_tpu.codec.mpeg4 import VideoReader
    with VideoReader(path) as r:
        by_gop = pred._segment_picks(r, 2)
        assert len(by_gop) < r.num_gops
        total_w = sum(float(w.sum()) for _, w in by_gop.values())
        assert total_w == 2  # every segment accounted for, as weight mass


def test_predict_videos_segments_matches_single(tmp_path):
    """Batched streaming dispatch with segments == per-video calls."""
    from jax.experimental.pallas import tpu as pltpu

    paths = []
    for i in range(3):
        p = tmp_path / f"s{i}.avi"
        _encode_panning(str(p), np.random.default_rng(90 + i),
                        n=14 + 12 * i)
        paths.append(str(p))
    pred = _make_predictor()
    with pltpu.force_tpu_interpret_mode():
        batched = pred.predict_videos(paths, chunk_gops=4, segments=5)
        single = [pred.predict_video(p, segments=5) for p in paths]
    for b, s in zip(batched, single):
        np.testing.assert_allclose(b, s, atol=1e-5)
