"""Serving API: whole-video prediction on a synthetic file."""

import numpy as np

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4


def test_predict_video(tmp_path):
    import jax

    from dmcnet_tpu.serving import DMCPredictor
    from dmcnet_tpu.models import DMCNet
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    pad = 40
    canvas = (rng.integers(0, 256, size=(64 + 2 * pad + 30,
                                         96 + 2 * pad + 60, 3))
              // 8 * 8).astype(np.uint8)
    frames = np.stack([canvas[pad + i:pad + i + 64,
                              pad + 2 * i:pad + 2 * i + 96]
                       for i in range(26)])
    path = tmp_path / "v.avi"
    encode_mpeg4(path, frames, gop_size=12, bit_rate=2_000_000)

    model = DMCNet(num_class=7, num_segments=1,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    hw = 64
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 1, hw, hw, 2)),
                           jnp.zeros((1, 1, hw, hw, 3)), train=False)
    pred = DMCPredictor(variables["params"],
                        variables.get("batch_stats", {}), num_class=7,
                        input_size=hw)
    scores = pred.predict_video(str(path))
    assert scores.shape == (7,)
    assert np.isfinite(scores).all()

    # Packed and unpacked paths agree on the argmax-level output.
    pred_np = DMCPredictor(variables["params"],
                           variables.get("batch_stats", {}), num_class=7,
                           input_size=hw, pack=False)
    scores2 = pred_np.predict_video(str(path))
    np.testing.assert_allclose(scores, scores2, atol=0.05)
