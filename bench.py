"""Headline benchmark: DMC generation + ResNet-18 classification throughput.

Measures clips/sec/chip for the flagship inference path (the paper's
headline speed claim: DMC generation replaces ~75 ms/frame TV-L1 flow):
MV+residual -> DenseNetTiny DMC generator -> ResNet-18 logits, bf16 on one
chip, steady-state, inputs resident in HBM.

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


def main(batch=256, steps=30, warmup=5, hw=224):
    from dmcnet_tpu.models import DMCNet

    model = DMCNet(num_class=51, num_segments=1, representation="mv",
                   arch="resnet18", arch_estimator="DenseNetTiny",
                   gen_flow_or_delta=1)

    rng = np.random.default_rng(0)
    mv = jnp.asarray(rng.normal(size=(batch, hw, hw, 2)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=(batch, hw, hw, 3)), jnp.bfloat16)

    variables = model.init(jax.random.key(0), mv.astype(jnp.float32),
                           res.astype(jnp.float32), train=False)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def forward(mv, res):
        logits, _ = model.apply(variables, mv, res, train=False)
        return logits

    # Compile + warmup.
    out = forward(mv, res)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = forward(mv, res)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(steps):
        out = forward(mv, res)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    clips_per_sec = batch * steps / dt
    print(json.dumps({
        "metric": "clips_per_sec_chip",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
