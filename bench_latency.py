"""Single-clip serving latency of the packed DMC+ResNet-18 path
(informational; merged into bench_extended.json).

Production serving cares about tail latency as well as throughput: this
measures batch-1 end-to-end device latency (H2D of one clip's mv+res ->
packed generator -> packed classifier -> logits fetched back to host) and
reports p50/p99 over many single-clip requests, plus the batch-8 p50 for
the common small-batch case.  The reference has no serving path at all
(test.py batches offline); the paper's claim is ~0.1 ms/frame DMC
generation vs ~75 ms TV-L1 flow.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build(hw=224):
    from dmcnet_tpu.models import make_estimator, resnet18
    from dmcnet_tpu.ops.packed_generator import PackedDenseEstimator
    from dmcnet_tpu.ops.packed_resnet import PackedResNet18

    gen = make_estimator("DenseNetTiny")
    gv = gen.init(jax.random.key(0), jnp.zeros((1, hw, hw, 5), jnp.float32))
    pg = PackedDenseEstimator(gv["params"], s=2, packed_output=True,
                              fuse_mv_delta=True)
    cls = resnet18(num_classes=51)
    cv = cls.init(jax.random.key(1), jnp.zeros((1, hw, hw, 2), jnp.float32),
                  train=False)
    pc = PackedResNet18(cv, dtype=jnp.bfloat16)

    @jax.jit
    def forward(mv, res):
        return pc(pg(jnp.concatenate([mv, res], axis=-1)))

    return forward


def measure(hw=224, requests=200, warmup=10):
    rng = np.random.default_rng(0)
    forward = _build(hw)
    out = {}
    for batch in (1, 8):
        # fresh host arrays per request: include the real H2D transfer
        mvs = [np.asarray(rng.normal(size=(batch, hw, hw, 2)), np.float32)
               for _ in range(8)]
        ress = [np.asarray(rng.normal(size=(batch, hw, hw, 3)), np.float32)
                for _ in range(8)]
        for i in range(warmup):
            r = forward(jnp.asarray(mvs[i % 8], jnp.bfloat16),
                        jnp.asarray(ress[i % 8], jnp.bfloat16))
        assert np.isfinite(float(r.astype(jnp.float32).sum()))
        lat = []
        for i in range(requests):
            t0 = time.perf_counter()
            r = forward(jnp.asarray(mvs[i % 8], jnp.bfloat16),
                        jnp.asarray(ress[i % 8], jnp.bfloat16))
            np.asarray(r)  # full device->host fetch = true completion
            lat.append(time.perf_counter() - t0)
        lat = np.asarray(lat) * 1e3
        out[f"b{batch}_p50_ms"] = round(float(np.percentile(lat, 50)), 3)
        out[f"b{batch}_p99_ms"] = round(float(np.percentile(lat, 99)), 3)

    # device-resident variant: inputs staged in HBM, only a scalar fetched —
    # isolates chip compute+launch from the tunnel's H2D/D2H cost.
    mv_d = jnp.asarray(rng.normal(size=(1, hw, hw, 2)), jnp.bfloat16)
    res_d = jnp.asarray(rng.normal(size=(1, hw, hw, 3)), jnp.bfloat16)
    for _ in range(warmup):
        r = forward(mv_d, res_d)
    assert np.isfinite(float(r.astype(jnp.float32).sum()))
    lat = []
    for _ in range(requests):
        t0 = time.perf_counter()
        r = forward(mv_d, res_d)
        float(r.astype(jnp.float32).sum())  # scalar fetch = true completion
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3
    out["b1_device_p50_ms"] = round(float(np.percentile(lat, 50)), 3)
    out["b1_device_p99_ms"] = round(float(np.percentile(lat, 99)), 3)
    return {
        "metric": "serving_latency_ms",
        "value": out["b1_p50_ms"],
        "unit": "ms (batch-1 p50)",
        **out,
        "note": "single-request H2D + packed DMC+ResNet-18 + D2H fetch, "
                "224^2, bf16; b*_p* include the axon tunnel round-trip "
                "and transfer (an on-prem host sees far less); even "
                "b1_device_* pays one tunnel round-trip per request — "
                "pure chip compute at this shape is ~1 ms (cf. 11.2k "
                "clips/s batched throughput)",
    }


if __name__ == "__main__":
    result = measure()
    from bench import update_extended
    update_extended("serving_latency", result)
    print(json.dumps(result))
