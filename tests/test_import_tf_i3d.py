"""TF Kinetics checkpoint importer: full-backbone roundtrip on a synthetic
TF-style variable dict (reference load_tf_weights, i3d.py:605-763)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models.i3d import _MIXED_PLAN, I3D, init_i3d_variables
from dmcnet_tpu.models.import_tf_i3d import import_tf_i3d, load_tf_weights


def _mixed_out(plan):
    return plan[0] + plan[2] + plan[4] + plan[5]


def _synth_tf_vars(prefix, rng, in_stem=3):
    """Build the full TF variable dict with correct shapes, independently of
    the importer (channel plan from the I3D architecture)."""
    v = {}

    def conv(scope, kt, kh, kw, cin, cout, bias=False, bn=True):
        v[f"{scope}/conv_3d/w"] = rng.normal(
            size=(kt, kh, kw, cin, cout)).astype(np.float32)
        if bias:
            v[f"{scope}/conv_3d/b"] = rng.normal(size=(cout,)).astype(
                np.float32)
        if bn:
            # TF stores (1,1,1,1,C)-shaped beta in some exports; test the
            # reshape(-1) path with the 5-D form.
            v[f"{scope}/batch_norm/beta"] = rng.normal(
                size=(1, 1, 1, 1, cout)).astype(np.float32)
            v[f"{scope}/batch_norm/moving_mean"] = rng.normal(
                size=(1, 1, 1, 1, cout)).astype(np.float32)
            v[f"{scope}/batch_norm/moving_variance"] = np.abs(rng.normal(
                size=(1, 1, 1, 1, cout))).astype(np.float32) + 0.5

    conv(f"{prefix}/Conv3d_1a_7x7", 7, 7, 7, in_stem, 64)
    conv(f"{prefix}/Conv3d_2b_1x1", 1, 1, 1, 64, 64)
    conv(f"{prefix}/Conv3d_2c_3x3", 3, 3, 3, 64, 192)
    cin = 192
    for name, plan in _MIXED_PLAN.items():
        scope = f"{prefix}/{name[0].upper() + name[1:]}"
        conv(f"{scope}/Branch_0/Conv3d_0a_1x1", 1, 1, 1, cin, plan[0])
        conv(f"{scope}/Branch_1/Conv3d_0a_1x1", 1, 1, 1, cin, plan[1])
        conv(f"{scope}/Branch_1/Conv3d_0b_3x3", 3, 3, 3, plan[1], plan[2])
        conv(f"{scope}/Branch_2/Conv3d_0a_1x1", 1, 1, 1, cin, plan[3])
        second = ("Conv3d_0a_3x3" if name == "mixed_5b" else "Conv3d_0b_3x3")
        conv(f"{scope}/Branch_2/{second}", 3, 3, 3, plan[3], plan[4])
        conv(f"{scope}/Branch_3/Conv3d_0b_1x1", 1, 1, 1, cin, plan[5])
        cin = _mixed_out(plan)
    conv(f"{prefix}/Logits/Conv3d_0c_1x1", 1, 1, 1, 1024, 400,
         bias=True, bn=False)
    return v


def _abstract(net, ch):
    x = jnp.zeros((1, 16, 224, 224, ch))
    return jax.eval_shape(
        lambda: init_i3d_variables(net, jax.random.key(0), x))


@pytest.mark.parametrize("modality,ch", [("rgb", 3), ("flow", 2)])
def test_tf_import_full_backbone(modality, ch, rng):
    prefix = ("RGB/inception_i3d" if modality == "rgb"
              else "Flow/inception_i3d")
    tf_vars = _synth_tf_vars(prefix, rng, in_stem=ch)
    net = I3D(num_classes=51, modality=modality)
    variables = _abstract(net, ch)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)

    params, bstats, report = load_tf_weights(
        tf_vars, zeros["params"], zeros["batch_stats"], modality=modality)

    # Every backbone leaf loaded (only the classifier head stays zero).
    stem = params["conv3d_1a_7x7"]["conv3d"]["kernel"]
    np.testing.assert_array_equal(
        stem, tf_vars[f"{prefix}/Conv3d_1a_7x7/conv_3d/w"])
    # mixed_5b typo scope consumed
    w5b = params["mixed_5b"]["branch_2b"]["conv3d"]["kernel"]
    np.testing.assert_array_equal(
        w5b, tf_vars[f"{prefix}/Mixed_5b/Branch_2/Conv3d_0a_3x3/conv_3d/w"])
    # BN: scale forced to ones, beta -> bias, moving stats -> batch_stats
    bn = params["mixed_4f"]["branch_0"]["batch3d"]
    np.testing.assert_array_equal(bn["scale"], np.ones_like(bn["scale"]))
    np.testing.assert_array_equal(
        bn["bias"],
        tf_vars[f"{prefix}/Mixed_4f/Branch_0/Conv3d_0a_1x1/"
                "batch_norm/beta"].reshape(-1))
    assert np.all(
        bstats["mixed_4f"]["branch_0"]["batch3d"]["var"] > 0)
    # logits conv has bias, no BN
    assert params["conv3d_0c_1x1"]["conv3d"]["bias"].shape == (400,)
    assert "batch3d" not in params["conv3d_0c_1x1"]
    assert "shape-missed=0" in report


def test_tf_import_stem_channel_adaptation(rng):
    """rgb TF checkpoint into a 2-channel (mv/flow+mp4) model: stem kernel
    channel-mean broadcast (train/model.py:55-58 semantics)."""
    tf_vars = _synth_tf_vars("Flow/inception_i3d", rng, in_stem=3)
    net = I3D(num_classes=5, modality="flow+mp4",
              arch_estimator="DenseNetTiny")
    variables = _abstract(net, 5)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    params, _, _ = load_tf_weights(
        tf_vars, zeros["params"], zeros["batch_stats"], modality="flow",
        in_channels=2)
    stem = params["conv3d_1a_7x7"]["conv3d"]["kernel"]
    assert stem.shape[3] == 2
    src = tf_vars["Flow/inception_i3d/Conv3d_1a_7x7/conv_3d/w"]
    np.testing.assert_allclose(stem[..., 0, :], src.mean(axis=3), rtol=1e-6)


def test_tf_import_npz_path(tmp_path, rng):
    """load_tf_weights from an .npz export (keys with '/')."""
    tf_vars = _synth_tf_vars("RGB/inception_i3d", rng)
    path = tmp_path / "i3d_rgb_tf.npz"
    np.savez(path, **tf_vars)
    net = I3D(num_classes=7, modality="rgb")
    variables = _abstract(net, 3)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    params, _, report = load_tf_weights(
        str(path), zeros["params"], zeros["batch_stats"], modality="rgb")
    assert "shape-missed=0" in report
    assert np.any(params["mixed_3b"]["branch_1b"]["conv3d"]["kernel"])


def test_import_tf_i3d_missing_var_raises(rng):
    tf_vars = _synth_tf_vars("RGB/inception_i3d", rng)
    del tf_vars["RGB/inception_i3d/Mixed_4c/Branch_0/Conv3d_0a_1x1/conv_3d/w"]
    with pytest.raises(KeyError):
        import_tf_i3d(tf_vars, modality="rgb")
