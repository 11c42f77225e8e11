"""load_i3d_pth on a real torch-saved file (synthetic kinetics-style keys)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dmcnet_tpu.models.i3d import I3D, init_i3d_variables  # noqa: E402
from dmcnet_tpu.models.import_torch_i3d import load_i3d_pth  # noqa: E402


def test_load_pth_file(tmp_path):
    net = I3D(num_classes=51, modality="flow")
    x = jnp.zeros((1, 16, 224, 224, 2))
    variables = jax.eval_shape(
        lambda: init_i3d_variables(net, jax.random.key(0), x))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                          variables["params"])
    bstats = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                          variables["batch_stats"])

    rng = np.random.default_rng(0)
    stem = rng.normal(size=(64, 3, 7, 7, 7)).astype(np.float32)  # rgb ckpt
    cls_w = rng.normal(size=(51, 400)).astype(np.float32)
    sd = {
        "conv3d_1a_7x7.conv3d.weight": torch.from_numpy(stem),
        "classifier.weight": torch.from_numpy(cls_w),
        "classifier.bias": torch.zeros(51),
    }
    path = tmp_path / "model_flow.pth"
    torch.save({"state_dict": sd}, path)

    new_params, new_bstats, report = load_i3d_pth(
        str(path), params, bstats, modality="flow")
    got = new_params["conv3d_1a_7x7"]["conv3d"]["kernel"]
    assert got.shape == (7, 7, 7, 2, 64)
    # rgb->flow: channel-mean broadcast (reference train/model.py:55-58)
    expect = stem.transpose(2, 3, 4, 1, 0).mean(3, keepdims=True)
    np.testing.assert_allclose(got, np.broadcast_to(expect, got.shape),
                               rtol=1e-6)
    np.testing.assert_allclose(new_params["classifier"]["kernel"],
                               cls_w.T, rtol=1e-6)
    assert "imported" in report
