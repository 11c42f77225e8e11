"""Reference-format checkpoint export: roundtrip through the (separately
parity-tested) importer must restore every leaf bit-exactly.

export_state_dict is the inverse of import_torch.import_state_dict, so a
model trained here can be torch.load'ed by the reference stack
(/root/reference/code/dmcnet/train.py:64-68,372-377) — closing the A/B
loop in both directions (same weights, both frameworks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models import DMCNet
from dmcnet_tpu.models.export_torch import (
    export_state_dict,
    save_reference_checkpoint,
)
from dmcnet_tpu.models.import_torch import import_state_dict, merge_variables
from dmcnet_tpu.train.engine import create_train_state


def _trained_like_state(model, batch):
    """Init + one train-mode forward so BN batch_stats are non-trivial."""
    state, _ = create_train_state(model, jax.random.key(0), batch,
                                  lr_cls_mult=0.01, lr_mse_mult=0.01,
                                  lr_d_mult=0.01 if model.arch_d else None)
    args = [batch["mv"], batch["residual"]]
    if model.arch_d:
        args.append(batch["flow"].reshape((-1,) + batch["flow"].shape[-3:]))
    _, mutated = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *args, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2)})
    return state.replace(batch_stats=mutated["batch_stats"])


def _roundtrip_and_compare(model, batch):
    state = _trained_like_state(model, batch)
    sd = export_state_dict(state.params, state.batch_stats)

    imported, skipped = import_state_dict(sd)
    assert skipped == [], skipped

    # merge into a DIFFERENTLY-seeded init: every leaf must be overwritten
    other, _ = create_train_state(model, jax.random.key(7), batch,
                                  lr_cls_mult=0.01, lr_mse_mult=0.01,
                                  lr_d_mult=0.01 if model.arch_d else None)
    merged, missing = merge_variables(
        {"params": other.params, "batch_stats": other.batch_stats},
        imported)
    assert missing == [], missing

    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                {"params": state.params, "batch_stats": state.batch_stats}),
            jax.tree_util.tree_leaves_with_path(merged)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(pa))


def _batch(rng, b=2, hw=32, gan=False):
    out = {
        "mv": jnp.asarray(rng.normal(size=(b, 1, hw, hw, 2)), jnp.float32),
        "residual": jnp.asarray(rng.normal(size=(b, 1, hw, hw, 3)),
                                jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(b, 1, hw, hw, 2)), jnp.float32),
        "label": jnp.asarray(np.arange(b, dtype=np.int32) % 5),
    }
    return out


def test_roundtrip_densenet_gan():
    """DenseNetTiny generator + ResNet-18 + Discriminator4 (covers convs,
    BN, fc, dense-estimator convs, discriminator blocks + adv_layer
    flatten reorder)."""
    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny", arch_d="Discriminator4",
                   detach_classifier=False)
    _roundtrip_and_compare(model, _batch(np.random.default_rng(0), gan=True))


def test_roundtrip_context_att():
    """ContextNetworkAtt (covers conv_context stages + predict_flow /
    predict_att Sequential heads with BN)."""
    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="ContextNetwork", att=1)
    _roundtrip_and_compare(model, _batch(np.random.default_rng(1)))


def test_roundtrip_early_fusion():
    """Early-fusion stem convs (conv_0_mv / conv_0_r)."""
    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTinyEarlyFusionStack")
    _roundtrip_and_compare(model, _batch(np.random.default_rng(2)))


def test_saved_pth_tar_loads_with_torch(tmp_path):
    """save_reference_checkpoint writes the exact reference payload dict
    (train.py:372-377) loadable by plain torch.load."""
    torch = pytest.importorskip("torch")
    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny")
    batch = _batch(np.random.default_rng(3))
    state = _trained_like_state(model, batch)
    path = str(tmp_path / "export_mv_checkpoint.pth.tar")
    save_reference_checkpoint(state, path, epoch=7, arch="resnet18",
                              best_prec1=61.5)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7
    assert ckpt["arch"] == "resnet18"
    assert ckpt["best_prec1"] == 61.5
    sd = ckpt["state_dict"]
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    # conv layout is torch OIHW: conv1 swapped to 2-ch input (model.py:289)
    assert tuple(sd["base_model.conv1.weight"].shape)[1] == 2
    # and the tensors import back bit-exactly
    imported, skipped = import_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    assert skipped == []
    merged, missing = merge_variables(
        {"params": state.params, "batch_stats": state.batch_stats},
        imported)
    assert missing == []
