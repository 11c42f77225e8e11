"""Honest end-to-end serving benchmark: compressed file on disk -> scores.

Covers what bench.py (HBM-resident) and bench_pipeline.py (device-resident
GOPs) deliberately exclude: the host side — native demux + entropy decode +
GOP accumulation — feeding the packed DMC+ResNet path per GOP via
`serving.DMCPredictor.predict_video`.

NOTE: this VM has ONE CPU core, so the host entropy decode (inherently
serial per stream, parallel across streams on real hosts) dominates here;
the number is a floor, not the production figure.  The device portion of
the same work is measured by bench_pipeline.py.
"""

import json
import os
import tempfile
import time

import numpy as np


def _textured_frames(rng, t, h, w, shift=(2, 1)):
    pad = max(shift) * t + 2
    canvas = rng.integers(0, 256, size=(h + 2 * pad, w + 2 * pad, 3))
    canvas = canvas.astype(np.float32)
    c = (canvas[0::2, 0::2] + canvas[1::2, 0::2] + canvas[0::2, 1::2]
         + canvas[1::2, 1::2]) / 4
    canvas = np.kron(c, np.ones((2, 2, 1))).astype(np.uint8)
    return np.stack([
        canvas[pad + shift[1] * i: pad + shift[1] * i + h,
               pad + shift[0] * i: pad + shift[0] * i + w]
        for i in range(t)])


def measure(n_videos=4, t=48, h=256, w=320):
    import jax

    from dmcnet_tpu.codec.mpeg4 import encode_mpeg4
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.serving import DMCPredictor

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    paths = []
    for v in range(n_videos):
        p = os.path.join(tmp, f"v{v}.avi")
        encode_mpeg4(p, _textured_frames(rng, t, h, w), gop_size=12,
                     bit_rate=2_000_000)
        paths.append(p)

    model = DMCNet(num_class=51, num_segments=1, arch="resnet18",
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    variables = model.init(
        jax.random.key(0), np.zeros((1, 1, 224, 224, 2), np.float32),
        np.zeros((1, 1, 224, 224, 3), np.float32), train=False)
    pred = DMCPredictor(variables["params"],
                        variables.get("batch_stats", {}))

    gops = n_videos * (t // 12)
    clips = gops * 3  # 3 sampled P-frames per GOP

    def run(backend):
        """Best-of-2 passes over the 4 videos (tunnel timing is noisy;
        single-shot windows produced the round-4 self-contradictory
        record — see PERF_NOTES 'e2e serving')."""
        pred.predict_video(paths[0], backend=backend)  # compile + warm

        def once():
            t0 = time.perf_counter()
            ref = None
            for p in paths:
                scores = pred.predict_video(p, frames_per_gop=3,
                                            backend=backend)
                assert np.isfinite(scores).all()
                ref = scores
            return time.perf_counter() - t0, ref

        d1, ref = once()
        d2, ref = once()
        return min(d1, d2), ref

    dt_host, s_host = run("host")
    try:
        dt_dev, s_dev = run("device")
        # warm on the full path set: the 16 real GOPs dispatch as ONE
        # full chunk, so the warm pass must hit the same g=16 program
        # (a 1-video warm would only compile the g=4 tail bucket)
        pred.predict_videos(paths, chunk_gops=16)

        def once_batched():
            t0 = time.perf_counter()
            b = pred.predict_videos(paths, frames_per_gop=3,
                                    backend="device", chunk_gops=16)
            return time.perf_counter() - t0, b

        d1, batched = once_batched()
        d2, batched = once_batched()
        dt_batched = min(d1, d2)
    except Exception:
        dt_dev = dt_batched = None  # disqualified or no Mosaic here
    if dt_dev is not None:
        # A/B OUTSIDE the try: a numerically wrong device backend must
        # fail the bench, not be mislabeled 'disqualified'.  Same
        # weights, bit-identical u8 inputs (tests/test_serving.py).
        assert np.allclose(s_dev, s_host, atol=0.05)
        assert np.allclose(batched[-1], s_host, atol=0.05)
    out = {
        "metric": "e2e_file_to_scores_clips_per_sec",
        "value": round(clips / (dt_dev if dt_dev else dt_host), 1),
        "unit": "clips/s",
        "host_backend_clips_per_sec": round(clips / dt_host, 1),
        "wall_ms_per_gop_host_backend": round(dt_host * 1e3 / gops, 2),
        "note": "disk -> demux -> entropy decode -> device back-trace "
                "(Pallas, from MV block lists; dense rasterize + "
                "accumulate + u8 encode all on device) -> packed "
                "DMC+ResNet, ONE host core; host-backend figure = the "
                "native-accumulate fallback path",
    }
    if dt_dev is not None:
        out["device_backend_clips_per_sec"] = round(clips / dt_dev, 1)
        out["wall_ms_per_gop_device_backend"] = round(dt_dev * 1e3 / gops, 2)
    if dt_batched is not None:
        out["value"] = max(out["value"], round(clips / dt_batched, 1))
        out["batched_device_clips_per_sec"] = round(clips / dt_batched, 1)
        out["wall_ms_per_gop_batched"] = round(dt_batched * 1e3 / gops, 2)

    # Reference 25-segment TSN protocol (--segments 25, test.py:48) on a
    # LONG video: only the GOPs owning a pick are entropy-decoded, an
    # ~num_gops/25 host-work cut vs scoring every GOP.
    t_long = 600  # 50 GOPs
    p_long = os.path.join(tmp, "long.avi")
    enc = _textured_frames(rng, t_long, h, w, shift=(1, 1))
    from dmcnet_tpu.codec.mpeg4 import encode_mpeg4 as _enc
    _enc(p_long, enc, gop_size=12, bit_rate=2_000_000)
    backend = "device" if dt_dev is not None else "host"
    # warm BOTH paths: the 50-GOP full scan hits program shapes none of
    # the 4-GOP videos compiled, and an unwarmed full scan would book XLA
    # compile time as protocol speedup
    pred.predict_video(p_long, backend=backend, segments=25)
    pred.predict_video(p_long, backend=backend)
    def timed(**kw):
        best = None
        for _ in range(2):  # best-of-2, same reason as run()
            t0 = time.perf_counter()
            s = pred.predict_video(p_long, backend=backend, **kw)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, s

    dt_seg, s_seg = timed(segments=25)
    dt_full, s_full = timed()
    assert np.isfinite(s_seg).all() and np.isfinite(s_full).all()
    out["long_video_full_scan_ms"] = round(dt_full * 1e3, 1)
    out["long_video_segments25_ms"] = round(dt_seg * 1e3, 1)
    out["segments25_speedup_50gop_video"] = round(dt_full / dt_seg, 2)
    return out


if __name__ == "__main__":
    result = measure()
    from bench import update_extended
    update_extended("e2e_serving", result)
    print(json.dumps(result))
