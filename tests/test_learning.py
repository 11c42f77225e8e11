"""Learning sanity (slow): the flagship model memorizes a tiny corpus.

No real dataset exists in this environment, so accuracy parity with the
reference's HMDB-51 numbers cannot be measured here; this test instead
proves the full train path LEARNS: distinct synthetic videos are classified
correctly after a few dozen two-optimizer steps through the real pipeline
(decode -> accumulate -> augment -> DMC generator -> ResNet-18).
"""

import numpy as np
import pytest

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4
from dmcnet_tpu.data.dmc_dataset import (
    BatchAssembler,
    CoviarDataset,
    augment_train_batch,
)
from dmcnet_tpu.data.lists import VideoItem

H, W, T, NCLS = 96, 112, 26, 3


@pytest.mark.slow
def test_flagship_memorizes_synthetic_corpus(tmp_path):
    import jax
    import jax.numpy as jnp

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine import create_train_state, make_train_step

    rng = np.random.default_rng(21)
    items = []
    for v in range(NCLS):
        path = tmp_path / f"v{v}.avi"
        base = np.kron(rng.integers(0, 256, size=(H // 8, W // 8, 3)),
                       np.ones((8, 8, 1))).astype(np.uint8)
        frames = np.stack([
            np.clip(base.astype(int) + rng.integers(-8, 9, size=(H, W, 3)),
                    0, 255).astype(np.uint8) for _ in range(T)])
        encode_mpeg4(path, frames, gop_size=12, bit_rate=2_000_000)
        items.append(VideoItem(str(path), v, T, None))

    ds = CoviarDataset(None, None, None, "mv", num_segments=1,
                       is_train=False, accumulate=True, mv_minmaxnorm=1,
                       items=items)
    asm = BatchAssembler(ds, input_size=64, scale_size=74)

    model = DMCNet(num_class=NCLS, num_segments=1,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    batch = augment_train_batch(asm.train_batch(range(NCLS)), "mv",
                                input_size=64)
    state, opts = create_train_state(model, jax.random.key(0), batch,
                                     lr_cls_mult=1.0, lr_mse_mult=1.0)
    step = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                           lr_mse_w=1.0)

    key = jax.random.key(1)
    recent = []
    for i in range(140):
        batch = augment_train_batch(asm.train_batch(range(NCLS)), "mv",
                                    input_size=64)
        key, sk = jax.random.split(key)
        state, metrics = step(state, batch, sk, jnp.float32(3e-4),
                              jnp.float32(0.0), jnp.asarray(True))
        recent.append(float(metrics["top1"]))
        if len(recent) >= 10 and np.mean(recent[-10:]) >= 99.0:
            break
    assert np.mean(recent[-10:]) >= 99.0, \
        f"did not memorize: last-10 top1={np.mean(recent[-10:]):.1f}"
