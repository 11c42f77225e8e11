"""Full TPU-resident serving pipeline benchmark (informational).

End-to-end on-device path per GOP, everything after the host's entropy
decode: dense MV maps + decoded frames (as produced once per GOP by the
native front-end) -> Pallas motion back-tracing -> accumulated MV +
residual -> normalization -> center crop -> packed DMC generator ->
ResNet-18 logits.  This is the pipeline the reference runs as
(C extension per frame) + (host transforms) + (GPU convnets).

The driver-facing headline metric stays in bench.py; this script reports
the pipeline breakdown.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(n_gops=32, gop_len=12, height=256, width=320, crop=224,
            gen_s=2, fold_norm=False):
    from dmcnet_tpu.codec.synthetic import dense_mv_maps, synthetic_gop
    from dmcnet_tpu.models import make_estimator, resnet18
    from dmcnet_tpu.ops.packed_generator import PackedDenseEstimator, repack
    from dmcnet_tpu.ops.pallas_backtrace import (
        backtrace_warp_batch,
        cell_mv_from_dense,
        coarsen_cell_mv,
    )

    rng = np.random.default_rng(0)
    gops = [synthetic_gop(rng, num_frames=gop_len, height=height,
                          width=width, block_size=16, max_motion=12)
            for _ in range(n_gops)]
    cell_mvs, frames = [], []
    for blocks, fr in gops:
        cm, ok = cell_mv_from_dense(dense_mv_maps(blocks, height, width))
        assert ok
        # 1MV-per-macroblock content runs the CELL=16 kernel variant
        # (~4x fewer per-cell fetches in the issue-bound shift loop)
        cm16, ok16 = coarsen_cell_mv(cm, height, width)
        assert ok16
        cell_mvs.append(cm16)
        frames.append(fr)
    cell = 16
    cell_mvs = jnp.asarray(np.stack(cell_mvs))
    frames = jnp.asarray(np.stack(frames))

    from dmcnet_tpu.ops.packed_resnet import PackedResNet18

    gen = make_estimator("DenseNetTiny")
    gen_vars = gen.init(jax.random.key(0),
                        jnp.zeros((1, crop, crop, 5), jnp.float32))
    # gen_s=4 runs the generator on a 4x4 space-to-depth grid (fewer,
    # wider convs) and repacks its s=4 output into the s=2 stem layout
    # (ops/packed_generator.repack, exact)
    mean_std = 0.2261  # (x-0.5)/mean(ImageNet std), dataset.py:260-262
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    # fold_norm absorbs the whole normalize affine (mv minmaxnorm scale +
    # the +0.5/255/std chain) into the generator weights (input_affine),
    # so the jitted pipeline feeds RAW integer mv/res straight to the
    # packed conv stack (|mv| <= 144 and |res| <= 255 are exact in bf16)
    affine = None
    if fold_norm:
        a_mv = (127.5 / 20.0) / (255.0 * mean_std)
        b_mv = 0.5 / (255.0 * mean_std)
        affine = (np.concatenate([[a_mv, a_mv], 1.0 / (255.0 * std)]),
                  np.concatenate([[b_mv, b_mv], 0.5 / (255.0 * std)]))
    packed_gen = PackedDenseEstimator(gen_vars["params"], s=gen_s,
                                      packed_output=True, fuse_mv_delta=True,
                                      input_affine=affine)
    cls = resnet18(num_classes=51)
    cls_vars = cls.init(jax.random.key(1),
                        jnp.zeros((1, crop, crop, 2), jnp.float32),
                        train=False)
    packed_cls = PackedResNet18(cls_vars, dtype=jnp.bfloat16)

    y0 = (height - crop) // 2
    x0 = (width - crop) // 2

    ident_x = jnp.arange(width, dtype=jnp.int32)[None, None, None, :]
    ident_y = jnp.arange(height, dtype=jnp.int32)[None, None, :, None]

    @jax.jit
    def pipeline(cell_mvs, frames):
        # One batched Pallas launch for all GOPs (grid (G, T)).
        iframes = jnp.transpose(frames[:, 0].astype(jnp.int32), (0, 3, 1, 2))
        accu, warped = backtrace_warp_batch(cell_mvs, iframes, height, width,
                                            cell=cell)
        # mv = own position - traced source; res = frame - warped base;
        # crop FIRST so normalization touches 224^2 only.
        mv = jnp.stack([ident_x - accu[:, 1:, 0],
                        ident_y - accu[:, 1:, 1]], axis=-1)
        res = frames[:, 1:].astype(jnp.int32) - \
            jnp.transpose(warped[:, 1:], (0, 1, 3, 4, 2))
        mv = mv[:, :, y0:y0 + crop, x0:x0 + crop]
        res = res[:, :, y0:y0 + crop, x0:x0 + crop]
        if fold_norm:
            # normalize lives in the generator weights; feed raw ints
            mv_n = mv.astype(jnp.bfloat16)
            res_n = res.astype(jnp.bfloat16)
        else:
            # mv_minmaxnorm(20) + +128 + /255 + (x-.5)/std, constants folded
            mv_n = ((mv.astype(jnp.float32) * (127.5 / 20.0) + 0.5)
                    / (255.0 * mean_std)).astype(jnp.bfloat16)
            res_n = (((res.astype(jnp.float32) + 0.5) / 255.0)
                     / (jnp.asarray(std))).astype(jnp.bfloat16)
        n_clips = n_gops * (gop_len - 1)
        mv_c = mv_n.reshape((n_clips, crop, crop, 2))
        res_c = res_n.reshape((n_clips, crop, crop, 3))
        # fused packed path: +mv folded into the generator weights, packed
        # 4x4 stem + folded BN in the classifier (ops/packed_resnet.py)
        dmc = packed_gen(jnp.concatenate([mv_c, res_c], -1))
        if gen_s != 2:
            dmc = repack(dmc, gen_s, 2, 2)
        return packed_cls(dmc)

    for _ in range(4):
        out = pipeline(cell_mvs, frames)
    assert np.isfinite(float(out.astype(jnp.float32).sum()))  # true sync
    t0 = time.perf_counter()
    steps = 20
    for _ in range(steps):
        out = pipeline(cell_mvs, frames)
    assert np.isfinite(float(out.astype(jnp.float32).sum()))
    dt = time.perf_counter() - t0
    clips = n_gops * (gop_len - 1) * steps
    return {
        "metric": "pipeline_clips_per_sec_chip",
        "value": round(clips / dt, 1),
        "unit": "clips/s",
        "note": "codec backtrace + residual + normalize + crop + DMC + "
                f"ResNet-18, fully on device ({n_gops}-GOP batches)",
    }


def measure_ab(gen_s=2):
    """Base pipeline + the fold_norm A/B arm (normalize affine absorbed
    into the packed generator weights — serving's default); one record."""
    out = measure(gen_s=gen_s)
    folded = measure(gen_s=gen_s, fold_norm=True)
    out["fold_norm_clips_per_sec"] = folded["value"]
    return out


def main():
    import sys

    gen_s = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = measure_ab(gen_s=gen_s)
    from bench import update_extended
    update_extended("pipeline", out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
