"""MFU accounting for every benched config.

FLOPs come from XLA's own HLO cost analysis of the EXACT jitted
computation each bench script times (the benches and this tool share the
same `build()` constructors): `jax.jit(fn).lower(args).cost_analysis()`
— no compile, CPU backend (HLO flop counts are backend-neutral: dots,
convs and elementwise ops of the optimized-for-lowering module).

Achieved TFLOPS = analytic flops/sample x the measured samples/s recorded
in bench_extended.json (real v5e chip, bench*.py).  MFU = achieved / peak.

Peaks (v5e, per chip): bf16 197 TFLOPS on the MXU.  f32 has no native MXU
mode — XLA lowers f32 convs/dots to multi-pass bf16 with f32 accumulation
at ~1/4 the bf16 rate, so f32 rows use 49.25 TFLOPS as "peak" (the
attainable ceiling for an f32 program, not the silicon bf16 number).
"mixed bf16" configs (params/BN f32, convs bf16) use the bf16 peak.

Usage:  python tools/mfu.py        # writes docs/mfu.json, prints the
                                   # markdown table for PERF_NOTES
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

PEAK = {"bf16": 197e12, "f32": 49.25e12}


def flops_of(fn, *args):
    lower = fn.lower if hasattr(fn, "lower") else jax.jit(fn).lower
    ca = lower(*args).cost_analysis()
    return float(ca["flops"])


def _rows(ext):
    """[(name, flops_per_sample, samples_per_sec, peak_key, unit,
    useful_flops_per_sample_or_None)]

    Two FLOPs figures per packed config: the packed program's own count
    (what the MXU actually executed, lane-padding waste included — the
    hardware-occupancy MFU) and the UNPACKED graph's count at the same
    shape (the useful work — effective MFU).  The packed rewrites are
    exact, so the unpacked graph is the semantic twin; its count is ~3x
    smaller because space-to-depth packing densifies 2-8-channel convs
    into full lanes by replicating taps."""
    import bench
    import bench_gan
    import bench_i3d
    import bench_train

    rows = []

    def tput(section, key):
        v = ext.get(section, {}).get(key)
        return float(v) if isinstance(v, (int, float)) else None

    # dmcnet flagship train step (batch 32 x 3 segments @ 224^2)
    step, state, bd, args = bench_train.build()
    f_dmc = flops_of(step, state, bd, *args) / 32
    rows.append(("dmcnet train f32", f_dmc, tput("train_step", "value"),
                 "f32", "samples/s", None))
    step, state, bd, args = bench_train.build(dtype=jnp.bfloat16)
    rows.append(("dmcnet train mixed-bf16", flops_of(
        step, state, bd, *args) / 32,
        tput("train_step", "bf16_samples_per_sec"), "bf16", "samples/s",
        None))

    # GAN alternating D/G (reference alternation: one of each per 2 steps)
    d_step, g_step, state, bd, args = bench_gan.build()
    f_gan = (flops_of(d_step, state, bd, *args)
             + flops_of(g_step, state, bd, *args)) / 2 / 32
    rows.append(("GAN train f32 (D/G avg)", f_gan,
                 tput("gan_train_step", "value"), "f32", "samples/s", None))

    # I3D G step configs.  Useful-FLOPs twin for packed rows: the
    # unpacked graph at the same clip length (per-sample count is batch-
    # invariant to <1%, so one trace per t serves every batch size).
    useful_i3d = {}

    def i3d_useful(t):
        if t not in useful_i3d:
            g_step, state, bd, args = bench_i3d.build(t=t)
            useful_i3d[t] = flops_of(g_step, state, bd, *args) / bd[
                "label"].size
        return useful_i3d[t]

    def i3d(name, key, peak, useful_t=None, **kw):
        t = tput("i3d_train_step", key)
        if t is None:
            return
        g_step, state, bd, args = bench_i3d.build(**kw)
        n = bd["label"].size
        rows.append((name, flops_of(g_step, state, bd, *args) / n, t, peak,
                     "samples/s",
                     i3d_useful(useful_t) if useful_t else None))

    i3d("I3D clip16 b4 f32", "value", "f32")
    i3d("I3D clip16 b4 packed-bf16", "packed_bf16_samples_per_sec", "bf16",
        useful_t=16, dtype=jnp.bfloat16, packed=4)
    i3d("I3D clip16 b16 packed-bf16", "packed_bf16_batch16_samples_per_sec",
        "bf16", useful_t=16, batch=16, dtype=jnp.bfloat16, packed=4)
    i3d("I3D recipe clip64 b3 packed-bf16",
        "recipe_clip64_b3_packed_bf16_samples_per_sec", "bf16",
        useful_t=64, batch=3, t=64, dtype=jnp.bfloat16, packed=4)
    # chunked full recipe: per-sample FLOPs == the monolithic count (the
    # chunk chain re-runs the same per-micro graph; the carry adds are
    # O(params), <0.01% of a 1.9-TFLOP sample)
    i3d("I3D recipe clip64 b3 iter32 chunked4 packed-bf16",
        "recipe_clip64_b3_iter32_chunked4_packed_bf16_samples_per_sec",
        "bf16", useful_t=64, batch=3, t=64, dtype=jnp.bfloat16, packed=4)
    i3d("I3D recipe clip64 b3 f32(+remat)",
        "recipe_clip64_b3_f32_remat_samples_per_sec", "f32",
        batch=3, t=64, remat=True)
    i3d("I3D recipe clip64 b3 f32",
        "recipe_clip64_b3_f32_samples_per_sec", "f32", batch=3, t=64)

    # packed serving forward (the 11.2k clips/s headline path); useful
    # twin = the stock DMCNet eval forward (generator + ResNet-18, the
    # exact semantic computation the packed rewrites implement)
    fwd, (mv, res) = bench.build_packed_forward()
    from dmcnet_tpu.models import DMCNet
    m = DMCNet(num_class=51, num_segments=1, arch="resnet18",
               arch_estimator="DenseNetTiny", gen_flow_or_delta=1,
               dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), jnp.zeros((1, 1, 224, 224, 2)),
               jnp.zeros((1, 1, 224, 224, 3)), train=False)
    useful_fwd = flops_of(
        jax.jit(lambda a, b: m.apply(v, a, b, train=False)),
        jnp.zeros((256, 1, 224, 224, 2), jnp.bfloat16),
        jnp.zeros((256, 1, 224, 224, 3), jnp.bfloat16)) / 256
    rows.append(("serving packed fwd bf16", flops_of(fwd, mv, res) / 256,
                 tput("headline", "value"), "bf16", "clips/s", useful_fwd))
    return rows


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench_extended.json")) as f:
        ext = json.load(f)
    out = []
    print("| config | GFLOPs/sample | measured | achieved TFLOPS | "
          "peak | MFU (hw) | MFU (useful) |")
    print("|---|---|---|---|---|---|---|")
    for name, fps, sps, peak_key, unit, useful in _rows(ext):
        if sps is None:
            continue
        achieved = fps * sps
        mfu = achieved / PEAK[peak_key]
        row = {"config": name, "gflops_per_sample": round(fps / 1e9, 2),
               "samples_per_sec": sps,
               "achieved_tflops": round(achieved / 1e12, 2),
               "peak": peak_key, "mfu_hw_pct": round(100 * mfu, 1)}
        if useful is not None:
            row["useful_gflops_per_sample"] = round(useful / 1e9, 2)
            row["mfu_useful_pct"] = round(100 * useful * sps
                                          / PEAK[peak_key], 1)
        out.append(row)
        u = (f"{row['mfu_useful_pct']}%" if useful is not None else "=")
        print(f"| {name} | {fps / 1e9:.2f} | {sps:g} {unit} | "
              f"{achieved / 1e12:.2f} | {peak_key} | {100 * mfu:.1f}% | "
              f"{u} |")
    with open(os.path.join(root, "docs", "mfu.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
