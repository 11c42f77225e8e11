"""Headline benchmark: DMC generation + ResNet-18 classification throughput.

Measures clips/sec/chip for the flagship inference path (the paper's
headline speed claim: DMC generation replaces ~75 ms/frame TV-L1 flow):
MV+residual -> DenseNetTiny DMC generator (space-to-depth packed, +mv
delta fused into the final conv weights — ops/packed_generator.py) ->
ResNet-18 (packed 4x4 stem + folded inference BN —
ops/packed_resnet.py) -> logits; bf16, one chip, steady state, inputs
resident in HBM.  Every rewrite is exact (bit-parity tested in f32).

Prints ONE JSON line:
  {"metric": "clips_per_sec_chip", "value": N, "unit": "clips/s",
   "vs_baseline": N / 5000.0}
(baseline: BASELINE.json target of >= 5000 clips/s/chip).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_packed_forward(batch=256, hw=224):
    """(forward, (mv, res)) for the packed serving path — shared by the
    timing loop and tools/mfu.py's FLOPs accounting."""
    from dmcnet_tpu.models import make_estimator, resnet18
    from dmcnet_tpu.ops.packed_generator import (
        PackedDenseEstimator,
        space_to_depth,
    )
    from dmcnet_tpu.ops.packed_resnet import PackedResNet18

    rng = np.random.default_rng(0)
    mv = jnp.asarray(rng.normal(size=(batch, hw, hw, 2)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=(batch, hw, hw, 3)), jnp.bfloat16)

    gen = make_estimator("DenseNetTiny")
    gen_vars = gen.init(jax.random.key(0),
                        jnp.zeros((1, hw, hw, 5), jnp.float32))
    # fully packed path: +mv delta fused into predict_flow weights
    # (gen_flow_or_delta=1, model.py:345-346), generator output stays in the
    # space-to-depth layout, ResNet-18 consumes it via the packed 4x4 stem
    # with inference BN folded (ops/packed_resnet.py) — all exact rewrites.
    packed_gen = PackedDenseEstimator(gen_vars["params"], s=2,
                                      packed_output=True, fuse_mv_delta=True)
    cls = resnet18(num_classes=51)
    cls_vars = cls.init(jax.random.key(1),
                        jnp.zeros((1, hw, hw, 2), jnp.float32), train=False)
    packed_cls = PackedResNet18(cls_vars, dtype=jnp.bfloat16)

    @jax.jit
    def forward(mv, res):
        x = jnp.concatenate([mv, res], axis=-1)
        return packed_cls(packed_gen(x))

    return forward, (mv, res)


def main(batch=256, steps=40, warmup=5, hw=224, windows=3):
    forward, (mv, res) = build_packed_forward(batch, hw)

    for _ in range(warmup):
        out = forward(mv, res)
    assert np.isfinite(float(out.sum()))  # true sync (tunnel-safe)

    # best of `windows` measurement windows: the TPU tunnel adds run-to-run
    # jitter; the max is the honest steady-state throughput of the chip.
    # Windows end with a real value fetch — block_until_ready alone can
    # return early through the tunnel.
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = forward(mv, res)
        assert np.isfinite(float(out.sum()))
        best_dt = min(best_dt, time.perf_counter() - t0)

    clips_per_sec = batch * steps / best_dt
    headline = {
        "metric": "clips_per_sec_chip",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / 5000.0, 3),
    }

    # Extended artifact (bench_extended.json): every round keeps a
    # TPU-smoked record beyond the serving headline.  The fast sections
    # (pipeline incl. the Pallas back-trace kernel) always refresh; the
    # slow ones (train step compiles, disk e2e, I3D) refresh when their
    # standalone scripts run (python bench_train.py / bench_e2e.py /
    # bench_i3d.py, each merging its section) or with BENCH_FULL=1 here.
    import os

    sections = [("pipeline", _measure_pipeline)]
    if os.environ.get("BENCH_FULL"):
        sections += [("train_step", _measure_train),
                     ("e2e_serving", _measure_e2e)]
    update_extended("headline", headline)
    for name, fn in sections:
        try:
            update_extended(name, fn())
        except Exception as exc:  # keep the headline robust
            update_extended(name, {"error": repr(exc)[:200]})

    print(json.dumps(headline))


def update_extended(key, value, path="bench_extended.json"):
    """Merge one section into the per-round extended-bench artifact."""
    data = {}
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        pass
    data[key] = value
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def _measure_pipeline():
    import bench_pipeline

    return bench_pipeline.measure_ab()


def _measure_train():
    import bench_train

    return bench_train.measure_both()


def _measure_e2e():
    import bench_e2e

    return bench_e2e.measure()


def _reexec_for_retry(attempt, why):
    import os
    import sys

    print(f"tunnel init {why} (attempt {attempt}); retrying in 60s",
          file=sys.stderr)
    time.sleep(60)
    os.environ["BENCH_TUNNEL_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def _main_with_tunnel_retries():
    """Run main(), recycling the process on TPU-tunnel init failures.

    The axon tunnel drops intermittently; losing it at the moment the
    driver runs this script would lose the round's headline.  Two failure
    modes are covered: backend init raising UNAVAILABLE, and backend init
    hanging outright (observed: jax.devices() wedges >7 min).  JAX caches
    backend-init state per process, so both retry via a fresh process
    (os.execv) with a bounded attempt counter in the env.
    """
    import os
    import threading

    attempt = int(os.environ.get("BENCH_TUNNEL_ATTEMPT", "0"))
    ready = threading.Event()

    def watchdog():
        import sys

        if ready.wait(timeout=240):
            return
        # grace windows: init finishing after the timeout must not kill a
        # healthy in-progress run (re-exec would discard its results)
        print("tunnel init slow (>240s); watchdog arming", file=sys.stderr)
        if ready.wait(timeout=90):
            return
        if attempt < 8:
            os.environ["BENCH_TUNNEL_ATTEMPT"] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        print("tunnel init hung at final attempt; giving up",
              file=sys.stderr)
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        jax.devices()  # force backend init under the watchdog
        ready.set()
        main()
    except Exception as exc:
        ready.set()
        msg = repr(exc)
        transient = ("UNAVAILABLE" in msg
                     or "Unable to initialize backend" in msg
                     or "DEADLINE_EXCEEDED" in msg)
        if transient and attempt < 8:
            _reexec_for_retry(attempt, "failed")
        raise


if __name__ == "__main__":
    _main_with_tunnel_retries()
