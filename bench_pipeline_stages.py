"""Stage attribution for the on-device pipeline (diagnostic, not driver-facing).

Times jitted sub-graphs of bench_pipeline's program separately so the
5k-clips/s push targets the real bottleneck instead of a guess:

  A. back-trace+warp Pallas kernel alone
  B. kernel + mv/res construction + normalize + crop (pre-generator)
  C. full pipeline (== bench_pipeline.measure)
  D. generator+classifier alone on HBM-resident crops (headline shape)

All measurements follow the tunnel rules (warm configs, >=20-step windows
closed by a real value fetch, best-of-3 windows).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, steps=20, windows=3):
    for _ in range(4):
        out = fn(*args)
    jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum().block_until_ready()
    float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main(n_gops=32, gop_len=12, height=256, width=320, crop=224):
    from dmcnet_tpu.codec.synthetic import dense_mv_maps, synthetic_gop
    from dmcnet_tpu.models import make_estimator, resnet18
    from dmcnet_tpu.ops.packed_generator import PackedDenseEstimator
    from dmcnet_tpu.ops.pallas_backtrace import (
        backtrace_warp_batch,
        cell_mv_from_dense,
        coarsen_cell_mv,
    )
    from dmcnet_tpu.ops.packed_resnet import PackedResNet18

    rng = np.random.default_rng(0)
    gops = [synthetic_gop(rng, num_frames=gop_len, height=height,
                          width=width, block_size=16, max_motion=12)
            for _ in range(n_gops)]
    cell_mvs, frames = [], []
    for blocks, fr in gops:
        cm, ok = cell_mv_from_dense(dense_mv_maps(blocks, height, width))
        assert ok
        cm16, ok16 = coarsen_cell_mv(cm, height, width)
        assert ok16
        cell_mvs.append(cm16)
        frames.append(fr)
    cell = 16
    cell_mvs = jnp.asarray(np.stack(cell_mvs))
    frames = jnp.asarray(np.stack(frames))

    gen = make_estimator("DenseNetTiny")
    gen_vars = gen.init(jax.random.key(0),
                        jnp.zeros((1, crop, crop, 5), jnp.float32))
    packed_gen = PackedDenseEstimator(gen_vars["params"], s=2,
                                      packed_output=True, fuse_mv_delta=True)
    cls = resnet18(num_classes=51)
    cls_vars = cls.init(jax.random.key(1),
                        jnp.zeros((1, crop, crop, 2), jnp.float32),
                        train=False)
    packed_cls = PackedResNet18(cls_vars, dtype=jnp.bfloat16)

    mean_std = 0.2261
    y0 = (height - crop) // 2
    x0 = (width - crop) // 2
    ident_x = jnp.arange(width, dtype=jnp.int32)[None, None, None, :]
    ident_y = jnp.arange(height, dtype=jnp.int32)[None, None, :, None]
    n_clips = n_gops * (gop_len - 1)

    @jax.jit
    def stage_a(cell_mvs, frames):
        iframes = jnp.transpose(frames[:, 0].astype(jnp.int32), (0, 3, 1, 2))
        return backtrace_warp_batch(cell_mvs, iframes, height, width,
                                    cell=cell)

    def mid(cell_mvs, frames):
        iframes = jnp.transpose(frames[:, 0].astype(jnp.int32), (0, 3, 1, 2))
        accu, warped = backtrace_warp_batch(cell_mvs, iframes, height, width,
                                    cell=cell)
        mv = jnp.stack([ident_x - accu[:, 1:, 0],
                        ident_y - accu[:, 1:, 1]], axis=-1)
        res = frames[:, 1:].astype(jnp.int32) - \
            jnp.transpose(warped[:, 1:], (0, 1, 3, 4, 2))
        mv = mv[:, :, y0:y0 + crop, x0:x0 + crop]
        res = res[:, :, y0:y0 + crop, x0:x0 + crop]
        mv_n = ((mv.astype(jnp.float32) * (127.5 / 20.0) + 0.5)
                / (255.0 * mean_std)).astype(jnp.bfloat16)
        res_n = (((res.astype(jnp.float32) + 0.5) / 255.0)
                 / jnp.asarray([0.229, 0.224, 0.225])).astype(jnp.bfloat16)
        mv_c = mv_n.reshape((n_clips, crop, crop, 2))
        res_c = res_n.reshape((n_clips, crop, crop, 3))
        return jnp.concatenate([mv_c, res_c], -1)

    stage_b = jax.jit(mid)

    @jax.jit
    def stage_c(cell_mvs, frames):
        return packed_cls(packed_gen(mid(cell_mvs, frames)))

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_clips, crop, crop, 5)),
        jnp.bfloat16)

    @jax.jit
    def stage_d(x):
        return packed_cls(packed_gen(x))

    import sys

    out = {"n_clips": n_clips}
    for name, fn, args in [
        ("a_kernel_ms", stage_a, (cell_mvs, frames)),
        ("b_pre_gen_ms", stage_b, (cell_mvs, frames)),
        ("c_full_ms", stage_c, (cell_mvs, frames)),
        ("d_gen_cls_ms", stage_d, (x,)),
    ]:
        out[name] = round(_time(fn, *args) * 1e3, 2)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    out["c_clips_per_sec"] = round(n_clips / (out["c_full_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
