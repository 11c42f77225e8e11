"""I3D torch-key import mapping: representative keys merge cleanly."""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
from dmcnet_tpu.models.import_torch import merge_variables
from dmcnet_tpu.models.import_torch_i3d import import_i3d_state_dict


def _abstract(net, ch):
    x = jnp.zeros((1, 16, 224, 224, ch))
    return jax.eval_shape(
        lambda: init_i3d_variables(net, jax.random.key(0), x))


def test_backbone_key_mapping():
    net = I3D(num_classes=51, modality="flow")
    variables = _abstract(net, 2)
    p = variables["params"]

    sd = {
        "conv3d_1a_7x7.conv3d.weight":
            np.zeros((64, 3, 7, 7, 7), np.float32),  # rgb ckpt, flow model
        "conv3d_1a_7x7.batch3d.weight": np.zeros((64,), np.float32),
        "conv3d_1a_7x7.batch3d.running_mean": np.zeros((64,), np.float32),
        "mixed_3b.branch_0.conv3d.weight":
            np.zeros((64, 192, 1, 1, 1), np.float32),
        "mixed_3b.branch_1.0.conv3d.weight":
            np.zeros((96, 192, 1, 1, 1), np.float32),
        "mixed_3b.branch_1.1.conv3d.weight":
            np.zeros((128, 96, 3, 3, 3), np.float32),
        "mixed_3b.branch_3.1.conv3d.weight":
            np.zeros((32, 192, 1, 1, 1), np.float32),
        "conv3d_0c_1x1.conv3d.weight":
            np.zeros((400, 1024, 1, 1, 1), np.float32),
        "conv3d_0c_1x1.conv3d.bias": np.zeros((400,), np.float32),
        "classifier.weight": np.zeros((51, 400), np.float32),
        "classifier.bias": np.zeros((51,), np.float32),
    }
    imported, skipped = import_i3d_state_dict(sd, in_channels=2)
    assert not skipped
    # rgb stem adapted to 2 channels
    stem = imported["params"]["conv3d_1a_7x7"]["conv3d"]["kernel"]
    assert stem.shape == (7, 7, 7, 2, 64)

    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    merged, missing = merge_variables(zeros, imported, strict_shapes=True)
    assert not missing
    got = merged["params"]["mixed_3b"]["branch_1b"]["conv3d"]["kernel"]
    assert got.shape == tuple(
        p["mixed_3b"]["branch_1b"]["conv3d"]["kernel"].shape)


def test_embedded_generator_keys():
    net = I3D(num_classes=5, modality="flow+mp4",
              arch_estimator="DenseNetTiny", arch_d="Discriminator4")
    variables = _abstract(net, 5)
    sd = {
        "gen_flow_model.conv_0.0.weight": np.zeros((8, 5, 3, 3), np.float32),
        "gen_flow_model.conv_0.0.bias": np.zeros((8,), np.float32),
        "gen_flow_model.predict_flow.weight":
            np.zeros((2, 33, 3, 3), np.float32),
        "discriminator.discriminator_block_1.0.weight":
            np.zeros((8, 2, 3, 3), np.float32),
        "discriminator.adv_layer.weight": None,
    }
    # adv_layer shape depends on input size; drop it for the mapping test.
    sd.pop("discriminator.adv_layer.weight")
    imported, skipped = import_i3d_state_dict(sd)
    assert not skipped
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    merged, missing = merge_variables(zeros, imported, strict_shapes=True)
    assert not missing
