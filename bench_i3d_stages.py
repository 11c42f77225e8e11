"""Per-section attribution of the I3D G step (diagnostic, not driver-facing).

bench_i3d.py's headline (47.6 f32 / 67 packed-bf16 samples/s) is
single-digit MFU; PERF_NOTES argues bandwidth-bound.  This probe times
jitted sub-graphs so the claim rests on measurement:

  * generator forward alone (per-frame DMC generation)
  * I3D backbone forward, truncated after the stem / mixed_3 / mixed_4 /
    full, train-mode BN (batch stats computed, not updated)
  * full fwd+bwd loss step (no optimizer) vs the full G step
  * XLA cost_analysis flops/bytes for the fwd program at the same shapes

Tunnel rules apply: warm first, windows end in a real value fetch.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, steps=10, windows=3):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main(batch=4, t=16, hw=224, dtype=jnp.bfloat16, packed=0):
    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables

    net = I3D(num_classes=51, modality="flow+mp4",
              arch_estimator="DenseNetTiny", dtype=dtype,
              packed_gen=packed)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, t, hw, hw, 5), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x0)

    mv_res = jnp.asarray(rng.normal(size=(batch, t, hw, hw, 5)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(batch, t, hw, hw, 2)), jnp.float32)
    label = jnp.asarray(np.arange(batch) % 51, jnp.int32)

    def backbone_prefix(sections):
        """Forward through the first `sections` trunk sections."""

        def fn(variables, x):
            def run(mdl, x):
                from dmcnet_tpu.models.i3d import max_pool_same

                out = mdl.conv3d_1a_7x7(x, True)
                out = max_pool_same(out, (1, 3, 3), (1, 2, 2))
                if sections >= 2:
                    out = mdl.conv3d_2b_1x1(out, True)
                    out = mdl.conv3d_2c_3x3(out, True)
                    out = max_pool_same(out, (1, 3, 3), (1, 2, 2))
                if sections >= 3:
                    out = mdl.mixed_3b(out, True)
                    out = mdl.mixed_3c(out, True)
                    out = max_pool_same(out, (3, 3, 3), (2, 2, 2))
                if sections >= 4:
                    out = mdl.mixed_4b(out, True)
                    out = mdl.mixed_4c(out, True)
                    out = mdl.mixed_4d(out, True)
                    out = mdl.mixed_4e(out, True)
                    out = mdl.mixed_4f(out, True)
                    out = max_pool_same(out, (2, 2, 2), (2, 2, 2))
                if sections >= 5:
                    out = mdl.mixed_5b(out, True)
                    out = mdl.mixed_5c(out, True)
                return out

            out, _ = net.apply(variables, x, method=run,
                               mutable=["batch_stats"])
            return out

        return jax.jit(fn)

    @jax.jit
    def gen_fwd(variables, mv_res):
        out, _ = net.apply(variables, mv_res, "gen_flow", False, True,
                           mutable=["batch_stats"])
        return out

    @jax.jit
    def full_fwd(variables, mv_res):
        out, _ = net.apply(variables, mv_res, "flow+logit", False, True,
                           mutable=["batch_stats"], rngs={})
        return out[0]

    def loss_fn(params, bstats, mv_res, flow, label):
        out, upd = net.apply(
            {"params": params, "batch_stats": bstats}, mv_res,
            "flow+logit", True, True, mutable=["batch_stats"])
        logits, gen = out
        mse = jnp.mean((gen - flow.astype(gen.dtype)) ** 2)
        ce = jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), label])
        return ce + 10.0 * mse, upd

    @jax.jit
    def fwd_bwd(variables, mv_res, flow, label):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"], variables["batch_stats"], mv_res, flow,
            label)
        # Reduce EVERY grad leaf into the result: returning a single leaf
        # lets XLA dead-code-eliminate the rest of the backward pass
        # (measured: fwd_bwd == fwd to within noise).
        gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return loss, gsum

    flow_in = jnp.asarray(rng.normal(size=(batch, t, hw, hw, 2)),
                          jnp.float32)
    out = {"batch": batch, "t": t, "hw": hw, "packed": packed,
           "dtype": "bf16" if dtype == jnp.bfloat16 else "f32"}

    probes = [
        ("gen_fwd_ms", gen_fwd, (variables, mv_res)),
        ("stem_ms", backbone_prefix(1), (variables, flow_in)),
        ("thru_2c_ms", backbone_prefix(2), (variables, flow_in)),
        ("thru_m3_ms", backbone_prefix(3), (variables, flow_in)),
        ("thru_m4_ms", backbone_prefix(4), (variables, flow_in)),
        ("thru_m5_ms", backbone_prefix(5), (variables, flow_in)),
        ("full_fwd_ms", full_fwd, (variables, mv_res)),
        ("fwd_bwd_ms", fwd_bwd, (variables, mv_res, flow, label)),
    ]
    for name, fn, args in probes:
        out[name] = round(_time(fn, *args) * 1e3, 2)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

    # Compiler-side flops/bytes for the fwd+bwd program.
    try:
        ca = fwd_bwd.lower(variables, mv_res, flow, label).compile()
        c = ca.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        out["fwd_bwd_gflops"] = round(c.get("flops", 0) / 1e9, 1)
        out["fwd_bwd_hbm_gb"] = round(
            c.get("bytes accessed", 0) / 1e9, 2)
    except Exception as exc:
        out["cost_analysis_error"] = repr(exc)[:120]
    print(json.dumps(out))


if __name__ == "__main__":
    main(packed=int(sys.argv[1]) if len(sys.argv) > 1 else 0)
