"""I3D train-step throughput (informational; captured in
bench_extended.json).

Measures the flagship-accuracy variant's jitted G step (generator + I3D +
MSE/CE losses, SGD group optimizers, BN updates) at the reference training
shape (clip 16 x 224^2, flow+mp4 modality) on one chip, f32 and bf16.
Reference equivalent: SpeedMonitor samples/sec of dmcnet_I3D
(train/callback.py:50-68).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch=4, t=16, hw=224, dtype=None, iter_size=1,
          stop_gradient=False, packed=0, train_backbone=True, remat=False):
    """(g_step, state, bd, args) — shared by the timing loop and
    tools/mfu.py (FLOPs must be counted on the exact timed computation)."""
    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
    from dmcnet_tpu.train.engine import TrainState
    from dmcnet_tpu.train.engine_i3d import (
        make_i3d_optimizers,
        make_i3d_steps,
    )

    net = I3D(num_classes=51, modality="flow+mp4",
              arch_estimator="DenseNetTiny", dtype=dtype,
              packed_gen=packed, remat=remat)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, t, hw, hw, 5), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    params, bstats = variables["params"], variables["batch_stats"]
    opts = make_i3d_optimizers(params, optim="sgd")
    state = TrainState(params=params, batch_stats=bstats,
                       opt_cls=opts["cls"].init(params),
                       opt_gf=opts["gf"].init(params))
    _, g_step = make_i3d_steps(net, opts, adv=0.0,
                               stop_gradient=stop_gradient,
                               train_backbone=train_backbone)
    bd = {
        "mv": jnp.asarray(rng.normal(size=(iter_size, batch, t, hw, hw, 2)),
                          jnp.float32),
        "residual": jnp.asarray(
            rng.normal(size=(iter_size, batch, t, hw, hw, 3)), jnp.float32),
        "flow": jnp.asarray(
            rng.normal(size=(iter_size, batch, t, hw, hw, 2)), jnp.float32),
        "label": jnp.asarray(
            (np.arange(iter_size * batch) % 51).reshape(iter_size, batch),
            jnp.int32),
    }
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-3),
            jnp.float32(0.0), jnp.float32(1e-4), jnp.asarray(False))
    return g_step, state, bd, args


def measure(batch=4, t=16, hw=224, steps=12, warmup=2, dtype=None,
            iter_size=1, stop_gradient=False, packed=0, train_backbone=True,
            remat=False):
    g_step, state, bd, args = build(batch, t, hw, dtype, iter_size,
                                    stop_gradient, packed, train_backbone,
                                    remat)

    def window(state, n):
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = g_step(state, bd, *args)
        sync = float(m["loss"]) + float(
            jnp.sum(jax.tree.leaves(state.params)[0]))
        assert np.isfinite(sync)
        return time.perf_counter() - t0, state

    _, state = window(state, warmup)
    d1, state = window(state, steps)
    d2, state = window(state, steps)
    dt = min(d1, d2)
    n_samples = batch * iter_size * steps
    return {
        "metric": "i3d_train_samples_per_sec_chip",
        "value": round(n_samples / dt, 2),
        "unit": "samples/s",
        "note": f"I3D flow+mp4 G step, batch {batch} x clip {t} @ {hw}^2, "
                "reference-faithful gradients (no stem stop-grad — the "
                "reference never detaches in fit, model.py:355,414)"
                + (" (bf16)" if dtype is not None else "")
                + (f" (packed s={packed})" if packed else "")
                + (f" (remat={remat})" if remat else "")
                + (" (stop-gradient fast mode)" if stop_gradient else "")
                + ("" if train_backbone else " (stage-1 frozen backbone)"),
    }


def measure_chunked_recipe(batch=3, t=64, hw=224, chunk=4, iter_size=32,
                           steps=2, warmup=1, dtype=jnp.bfloat16, packed=4):
    """The FULL reference recipe (clip 64 x batch 3 x iter-size 32,
    code/dmcnet_I3D/train.sh) via host-chunked accumulation
    (engine_i3d.make_i3d_chunked_steps) — the monolithic stack is ~8.6 GB
    of resident input and does not fit alongside the step's working set
    on one chip.

    One (chunk, B, ...) input block stays resident and is re-fed
    iter_size/chunk times per macro step: identical device work to a real
    macro step (same programs, same shapes — only the input VALUES
    repeat), consistent with every other bench here keeping inputs
    resident in HBM."""
    assert iter_size % chunk == 0
    from dmcnet_tpu.train.engine_i3d import make_i3d_chunked_steps

    g_step, state, bd, args = build(batch, t, hw, dtype, chunk, False,
                                    packed, True, False)
    del g_step  # rebuilt chunked below on the same net/opts/state
    # build() hands back (net-bound) steps only; recover net/opts via a
    # fresh construction sharing the identical config
    from dmcnet_tpu.models.i3d import I3D
    from dmcnet_tpu.train.engine_i3d import make_i3d_optimizers

    net = I3D(num_classes=51, modality="flow+mp4",
              arch_estimator="DenseNetTiny", dtype=dtype,
              packed_gen=packed)
    opts = make_i3d_optimizers(state.params, optim="sgd")
    _, _, g_accum, g_apply = make_i3d_chunked_steps(net, opts, adv=0.0)
    key, lr, lr1, lr_d, wd, drop = args
    n_chunks = iter_size // chunk

    def macro(state):
        carry = None
        for _ in range(n_chunks):
            carry = g_accum(state, bd, key, carry, drop)
        return g_apply(state, carry, lr, lr1, lr_d, wd, drop)

    def window(state, n):
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = macro(state)
        sync = float(m["loss"]) + float(
            jnp.sum(jax.tree.leaves(state.params)[0]))
        assert np.isfinite(sync)
        return time.perf_counter() - t0, state

    _, state = window(state, warmup)
    d1, state = window(state, steps)
    d2, state = window(state, steps)
    dt = min(d1, d2)
    return {
        "value": round(batch * iter_size * steps / dt, 2),
        "unit": "samples/s",
    }


def measure_both():
    """Flagship train.sh recipe: stage-2 G step f32 as the headline
    (reference-faithful gradients), plus bf16 / packed-generator /
    remat='dots' (save-conv-outs backward, the HBM-traffic lever) /
    stop-gradient fast mode / stage-1-frozen variants."""
    out = measure()
    out["bf16_samples_per_sec"] = measure(dtype=jnp.bfloat16)["value"]
    out["packed_bf16_samples_per_sec"] = measure(
        dtype=jnp.bfloat16, packed=4)["value"]
    out["packed_bf16_dots_remat_samples_per_sec"] = measure(
        dtype=jnp.bfloat16, packed=4, remat="dots")["value"]
    out["packed_bf16_stopgrad_samples_per_sec"] = measure(
        dtype=jnp.bfloat16, packed=4, stop_gradient=True)["value"]
    out["stage1_frozen_samples_per_sec"] = measure(
        train_backbone=False)["value"]
    # per-chip utilization is THE I3D lever (PERF_NOTES.md §2): batch 4
    # leaves the chip half idle; 16 is the production per-chip figure
    out["packed_bf16_batch16_samples_per_sec"] = measure(
        batch=16, dtype=jnp.bfloat16, packed=4)["value"]
    out.update(measure_reference_recipe())
    return out


def measure_reference_recipe(keys=None):
    """The shape the released models were actually trained with: clip 64 x
    batch 3 x iter-size 32 (reference code/dmcnet_I3D/train.sh
    `--clip-length 64 --batch-size 3 --iter-size 32`, flow+mp4).

    The in-step lax.scan holds the whole (iter_size, batch, ...) input
    resident: at the full recipe that is ~8.7 GB of f32 inputs, so the
    f32 run uses --remat; samples/s is flat in iter_size (the scan only
    amortizes the optimizer), measured explicitly at 1 vs 4."""
    out = {}

    def safe(key, fn=None, **kw):
        if keys is not None and not any(s in key for s in keys):
            return  # each config is a 10-25 min remote compile
        if fn is None:
            fn = lambda **k: measure(batch=3, t=64, warmup=1, **k)
            kw.setdefault("steps", 4)
        try:
            out[key] = fn(**kw)["value"]
        except Exception as exc:  # OOM at this shape is a result, not a bug
            # ... but an infra failure (tunnel drop mid-compile) is NOT —
            # recording it would mislabel a transient outage as "does not
            # fit"; abort so the run is retried instead.  An HTTP 500 from
            # the compile helper IS deterministic (a compile error — the
            # detail, e.g. "Ran out of memory in memory space hbm", lands
            # in the helper's stderr log, not the exception; the exception
            # text is just the /remote_compile URL, which must NOT be
            # mistaken for a transport failure).
            msg = f"{type(exc).__name__}: {exc}"
            if ("HTTP 500" not in msg
                    and any(s in msg for s in ("UNAVAILABLE", "transport",
                                               "DEADLINE"))):
                raise
            out[key] = f"OOM/failed: {msg[:200]}"

    safe("recipe_clip64_b3_f32_samples_per_sec")
    safe("recipe_clip64_b3_packed_bf16_samples_per_sec",
         dtype=jnp.bfloat16, packed=4)
    safe("recipe_clip64_b3_iter4_packed_bf16_samples_per_sec",
         dtype=jnp.bfloat16, packed=4, iter_size=4)
    # the full recipe's iter-size (one step = 96 clips of 64 frames —
    # ~8.7 GB of resident f32 input; OOM here is a recorded outcome)
    safe("recipe_clip64_b3_iter32_packed_bf16_samples_per_sec",
         dtype=jnp.bfloat16, packed=4, iter_size=32, steps=1)
    # the path that FITS at the full recipe: host-chunked accumulation
    # (engine_i3d.make_i3d_chunked_steps; --accum-chunk in cli/train_i3d)
    safe("recipe_clip64_b3_iter32_chunked4_packed_bf16_samples_per_sec",
         fn=measure_chunked_recipe)
    if isinstance(out.get("recipe_clip64_b3_f32_samples_per_sec"), str):
        safe("recipe_clip64_b3_f32_remat_samples_per_sec", remat=True)
    return out


if __name__ == "__main__":
    result = measure_both()
    from bench import update_extended
    update_extended("i3d_train_step", result)
    print(json.dumps(result))
