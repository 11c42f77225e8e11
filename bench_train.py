"""Flagship TRAIN-step throughput (informational + captured in
bench_extended.json by bench.py).

Measures the real jitted two-optimizer dmcnet train step (DenseNetTiny DMC
generator + ResNet-18 TSN, CE+MSE, GroupAdam pair, BN updates) in steady
state on one chip with batches resident in HBM — the reference's
SpeedMonitor samples/sec equivalent (train/callback.py:50-68).  Host decode
overlap is excluded by construction (measured separately by the data
pipeline; this VM has one CPU core, so host-side numbers here would not be
representative of a production host).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch=32, segments=3, hw=224, dtype=None):
    """(step, state, batch_d, args) for the flagship train step — shared
    by the timing loop below and tools/mfu.py's FLOPs accounting (the MFU
    table must analyze EXACTLY the computation that was timed)."""
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine import create_train_state, make_train_step

    model = DMCNet(num_class=51, num_segments=segments,
                   representation="mv", arch="resnet18",
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1,
                   dtype=dtype)
    rng = np.random.default_rng(0)
    batch_d = {
        "mv": jnp.asarray(rng.normal(size=(batch, segments, hw, hw, 2)),
                          jnp.float32),
        "residual": jnp.asarray(
            rng.normal(size=(batch, segments, hw, hw, 3)), jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(batch, segments, hw, hw, 2)),
                            jnp.float32),
        "label": jnp.asarray(np.arange(batch) % 51, jnp.int32),
    }
    state, opts = create_train_state(model, jax.random.key(0), batch_d,
                                     lr_cls_mult=0.01, lr_mse_mult=0.01)
    step = make_train_step(model, opts, num_segments=segments,
                           lr_cls_w=1.0, lr_mse_w=1.0)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    return step, state, batch_d, args


def measure(batch=32, segments=3, hw=224, steps=50, warmup=5, dtype=None):
    step, state, batch_d, args = build(batch, segments, hw, dtype)

    # Long windows ended by a real VALUE fetch: over the TPU tunnel,
    # block_until_ready alone can return before the queued chain finishes,
    # under-measuring by an order of magnitude — fetching a scalar that
    # depends on the final state forces the true sync.
    def window(state, n):
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch_d, *args)
        sync = float(m["loss"]) + float(
            jnp.sum(jax.tree.leaves(state.params)[0]))
        assert np.isfinite(sync)
        return time.perf_counter() - t0, state

    _, state = window(state, warmup)
    dt1, state = window(state, steps)
    dt2, state = window(state, steps)
    dt = min(dt1, dt2)
    return {
        "metric": "train_samples_per_sec_chip",
        "value": round(batch * steps / dt, 1),
        "unit": "samples/s",
        "note": f"dmcnet flagship train step, batch {batch} x {segments} "
                f"segments @ {hw}^2, two GroupAdam optimizers + BN updates"
                + (" (bf16 mixed precision)" if dtype is not None else ""),
        "steps_per_sec": round(steps / dt, 2),
    }


def measure_both():
    """f32 (reference parity) + bf16 (--bf16 mixed precision) train step."""
    out = measure()
    out["bf16_samples_per_sec"] = measure(dtype=jnp.bfloat16)["value"]
    return out


if __name__ == "__main__":
    result = measure_both()
    from bench import update_extended
    update_extended("train_step", result)
    print(json.dumps(result))
