"""--pretrained_2d inflation, --new_classifier overlay, and TF .npz init
through the CLI's `init_pretrained` dispatcher (reference
train_model.py:181-206 + network/initializer.py:62-143)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dmcnet_tpu.cli.train_i3d import build_parser, init_pretrained
from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
from dmcnet_tpu.models.import_torch_i3d import load_i3d_pth_2d


def _zeros_variables(net, ch):
    x = jnp.zeros((1, 16, 224, 224, ch))
    variables = jax.eval_shape(
        lambda: init_i3d_variables(net, jax.random.key(0), x))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)


def _sd_2d(rng, num_classes=51):
    """2D checkpoint with I3D module names (what init_3d_from_2d_dict
    consumes): 4D conv kernels + matching BN stats."""
    return {
        "conv3d_1a_7x7.conv3d.weight":
            rng.normal(size=(64, 3, 7, 7)).astype(np.float32),
        "conv3d_1a_7x7.batch3d.weight":
            rng.normal(size=(64,)).astype(np.float32),
        "conv3d_1a_7x7.batch3d.bias":
            rng.normal(size=(64,)).astype(np.float32),
        "conv3d_1a_7x7.batch3d.running_mean":
            rng.normal(size=(64,)).astype(np.float32),
        "conv3d_1a_7x7.batch3d.running_var":
            np.abs(rng.normal(size=(64,))).astype(np.float32) + 0.5,
        "conv3d_2b_1x1.conv3d.weight":
            rng.normal(size=(64, 64, 1, 1)).astype(np.float32),
        # classifier with a MISMATCHED class count — must be skipped
        # (initializer.py:125-126).
        "classifier.weight":
            rng.normal(size=(400, 400)).astype(np.float32),
        "classifier.bias": rng.normal(size=(400,)).astype(np.float32),
    }


def test_inflation_2d_to_3d(tmp_path, rng):
    net = I3D(num_classes=51, modality="flow")
    zeros = _zeros_variables(net, 2)
    sd = _sd_2d(rng)
    path = tmp_path / "model_2d.pth"
    torch.save(sd, path)

    params, bstats, report = load_i3d_pth_2d(
        str(path), zeros["params"], zeros["batch_stats"], modality="flow")

    # stem: OIhw -> hwIO, channel-mean to 2ch, tiled over t=7 and /7
    # (mean-preserving 'inflation', initializer.py:70-76).
    stem = params["conv3d_1a_7x7"]["conv3d"]["kernel"]
    assert stem.shape == (7, 7, 7, 2, 64)
    w2d = np.transpose(sd["conv3d_1a_7x7.conv3d.weight"], (2, 3, 1, 0))
    w2d = w2d.mean(axis=2, keepdims=True)  # rgb->flow channel mean
    for t in range(7):
        np.testing.assert_allclose(stem[t, ..., 0, :],
                                   w2d[..., 0, :] / 7.0, rtol=1e-6)
    # temporal sum preserves the 2D response on constant-in-time input
    np.testing.assert_allclose(stem.sum(axis=0)[..., 0, :],
                               w2d[..., 0, :], rtol=1e-5)
    # 1x1 conv: target kt=1, plain reshape (no /t scaling beyond t=1)
    k2b = params["conv3d_2b_1x1"]["conv3d"]["kernel"]
    assert k2b.shape == (1, 1, 1, 64, 64)
    np.testing.assert_allclose(
        k2b[0],
        np.transpose(sd["conv3d_2b_1x1.conv3d.weight"], (2, 3, 1, 0)),
        rtol=1e-6)
    # BN stats carried over
    np.testing.assert_allclose(
        bstats["conv3d_1a_7x7"]["batch3d"]["mean"],
        sd["conv3d_1a_7x7.batch3d.running_mean"], rtol=1e-6)
    # mismatched classifier dropped
    assert not params["classifier"]["kernel"].any()
    assert "shape-missed" in report


def test_cli_pretrained_2d_and_new_classifier(tmp_path, rng):
    """init_pretrained dispatch: --pretrained_2d inflates, then
    --new_classifier overlays a (matching) classifier from model_flow.pth."""
    net = I3D(num_classes=51, modality="flow")
    zeros = _zeros_variables(net, 2)

    p2d = tmp_path / "p2d.pth"
    torch.save(_sd_2d(rng), p2d)
    cls_w = rng.normal(size=(51, 400)).astype(np.float32)
    flow_pth = tmp_path / "model_flow.pth"
    torch.save({"classifier.weight": cls_w,
                "classifier.bias": np.zeros((51,), np.float32)}, flow_pth)

    args = build_parser().parse_args([
        "--modality", "flow", "--pretrained_2d", "1",
        "--pretrained_3d", str(p2d),
        "--new_classifier", "1",
        "--new-classifier-weights", str(flow_pth)])
    params, bstats = init_pretrained(
        args, zeros["params"], zeros["batch_stats"])
    assert params["conv3d_1a_7x7"]["conv3d"]["kernel"].any()
    np.testing.assert_allclose(params["classifier"]["kernel"],
                               cls_w.T, rtol=1e-6)


def test_cli_pretrained_tf_npz(tmp_path, rng):
    """init_pretrained routes .npz to the TF importer."""
    from tests.test_import_tf_i3d import _synth_tf_vars

    tf_vars = _synth_tf_vars("Flow/inception_i3d", rng, in_stem=2)
    path = tmp_path / "kinetics_flow.npz"
    np.savez(path, **tf_vars)
    net = I3D(num_classes=51, modality="flow")
    zeros = _zeros_variables(net, 2)
    args = build_parser().parse_args([
        "--modality", "flow", "--pretrained_3d", str(path)])
    params, bstats = init_pretrained(
        args, zeros["params"], zeros["batch_stats"])
    np.testing.assert_array_equal(
        params["conv3d_1a_7x7"]["conv3d"]["kernel"],
        tf_vars["Flow/inception_i3d/Conv3d_1a_7x7/conv_3d/w"])


def test_cli_pretrained_skipped_on_resume(tmp_path, rng):
    p2d = tmp_path / "p2d.pth"
    torch.save(_sd_2d(rng), p2d)
    net = I3D(num_classes=51, modality="flow")
    zeros = _zeros_variables(net, 2)
    args = build_parser().parse_args([
        "--modality", "flow", "--pretrained_2d", "1",
        "--pretrained_3d", str(p2d), "--resume-epoch", "3"])
    params, _ = init_pretrained(args, zeros["params"], zeros["batch_stats"])
    assert not params["conv3d_1a_7x7"]["conv3d"]["kernel"].any()
