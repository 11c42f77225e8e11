"""GAN train-step throughput (informational; merged into
bench_extended.json).

Measures the jitted alternating D-step and G-step of the dmcnet_GAN
variant (DenseNetTiny generator + ResNet-18 TSN + Discriminator3, three
GroupAdam optimizers — the exp_my/hmdb51_gan recipe) at the reference
training shape on one chip.  Reference equivalent: the per-batch timing
meters of code/dmcnet_GAN/train.py:223-288.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch=32, segments=3, hw=224, dtype=None):
    """(d_step, g_step, state, bd, args) — shared by the timing loop and
    tools/mfu.py (FLOPs must be counted on the exact timed computation)."""
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine import create_train_state
    from dmcnet_tpu.train.engine_gan import make_gan_train_steps

    model = DMCNet(num_class=51, num_segments=segments,
                   representation="mv", arch="resnet18",
                   arch_estimator="DenseNetTiny", arch_d="Discriminator3",
                   gen_flow_or_delta=1, dtype=dtype)
    rng = np.random.default_rng(0)
    bd = {
        "mv": jnp.asarray(rng.normal(size=(batch, segments, hw, hw, 2)),
                          jnp.float32),
        "residual": jnp.asarray(
            rng.normal(size=(batch, segments, hw, hw, 3)), jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(batch, segments, hw, hw, 2)),
                            jnp.float32),
        "label": jnp.asarray(np.arange(batch) % 51, jnp.int32),
    }
    state, opts = create_train_state(model, jax.random.key(0), bd,
                                     lr_cls_mult=0.01, lr_mse_mult=0.01,
                                     lr_d_mult=1.0)
    d_step, g_step = make_gan_train_steps(
        model, opts, num_segments=segments, lr_cls_w=1.0, lr_adv_g=1.0,
        lr_adv_d=0.01, lr_mse_w=10.0)
    # fn(state, batch, rng, lr, lr_cls, lr_d, wd)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-3),
            jnp.float32(1e-3), jnp.float32(1e-4))
    return d_step, g_step, state, bd, args


def measure(batch=32, segments=3, hw=224, steps=40, warmup=5, dtype=None):
    d_step, g_step, state, bd, args = build(batch, segments, hw, dtype)

    def window(state, n):
        t0 = time.perf_counter()
        for i in range(n):
            # reference alternation: even batches D, odd batches G
            state, m = (d_step if i % 2 == 0 else g_step)(state, bd, *args)
        sync = float(m["loss"]) + float(
            jnp.sum(jax.tree.leaves(state.params)[0]))
        assert np.isfinite(sync)
        return time.perf_counter() - t0, state

    _, state = window(state, warmup * 2)
    d1, state = window(state, steps)
    d2, state = window(state, steps)
    dt = min(d1, d2)
    return {
        "metric": "gan_train_samples_per_sec_chip",
        "value": round(batch * steps / dt, 1),
        "unit": "samples/s",
        "note": f"alternating D/G steps (hmdb51_gan recipe, "
                f"Discriminator3), batch {batch} x {segments} segments @ "
                f"{hw}^2" + (" (bf16)" if dtype is not None else ""),
    }


if __name__ == "__main__":
    result = measure()
    result["bf16_samples_per_sec"] = measure(dtype=jnp.bfloat16)["value"]
    from bench import update_extended
    update_extended("gan_train_step", result)
    print(json.dumps(result))
