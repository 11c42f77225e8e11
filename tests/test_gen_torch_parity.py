"""Cross-framework parity for the generator and discriminator families:
the REFERENCE torch modules (imported straight from /root/reference with
their unused heavy deps stubbed) vs our flax twins with imported weights."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmcnet_tpu.models.discriminators import make_discriminator
from dmcnet_tpu.models.generators import make_estimator
from dmcnet_tpu.models.import_torch import import_state_dict, merge_variables

_REF_DIR = "/root/reference/code/dmcnet_GAN"


@pytest.fixture(scope="module")
def ref_model():
    """Import the reference model.py with cv2/torchvision/transforms
    stubbed (the generator/discriminator classes don't touch them)."""
    for name in ("cv2", "torchvision"):
        sys.modules.setdefault(name, types.ModuleType(name))
    stub = types.ModuleType("transforms")
    stub.GroupMultiScaleCrop = object
    stub.GroupRandomHorizontalFlip = object
    sys.modules["transforms"] = stub
    sys.path.insert(0, _REF_DIR)
    try:
        import model as ref_model
    finally:
        sys.path.pop(0)
        sys.modules.pop("transforms", None)
    return ref_model


def _to_flax(torch_mod, prefix):
    sd = {f"{prefix}.{k}": v for k, v in torch_mod.state_dict().items()}
    imported, skipped = import_state_dict(sd)
    assert not skipped, skipped
    return imported["params"][prefix.split(".")[-1]], imported[
        "batch_stats"].get(prefix.split(".")[-1], {})


@pytest.mark.parametrize("torch_name,flax_name", [
    ("EstimatorDenseNetTiny", "DenseNetTiny"),
    ("EstimatorDenseNetSmall", "DenseNetSmall"),
    ("EstimatorDenseNetTinyEarlyFusionSum", "DenseNetTinyEarlyFusionSum"),
    ("EstimatorDenseNetTinyEarlyFusionStack", "DenseNetTinyEarlyFusionStack"),
])
def test_estimator_parity(ref_model, rng, torch_name, flax_name):
    torch.manual_seed(0)
    ref = getattr(ref_model, torch_name)(5).eval()
    x = rng.normal(size=(2, 32, 32, 5)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    net = make_estimator(flax_name)
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 5))))
    params, _ = _to_flax(ref, "gen_flow_model")
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         variables["params"])
    merged, missing = merge_variables(
        {"params": zeros}, {"params": params}, strict_shapes=True)
    assert not missing
    got = net.apply({"params": merged["params"]}, jnp.asarray(x),
                    train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_context_network_parity(ref_model, rng):
    """Dilated-conv generator with BN (eval stats) vs reference torch."""
    torch.manual_seed(2)
    ref = ref_model.ContextNetwork(5, batch_norm=True).eval()
    # non-trivial BN stats
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.1, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    x = rng.normal(size=(2, 64, 64, 5)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    net = make_estimator("ContextNetwork")
    variables = net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 5)),
                         train=False)
    params, bstats = _to_flax(ref, "gen_flow_model")
    merged, missing = merge_variables(
        {"params": jax.tree.map(np.zeros_like, variables["params"]),
         "batch_stats": jax.tree.map(np.zeros_like,
                                     variables["batch_stats"])},
        {"params": params, "batch_stats": bstats}, strict_shapes=True)
    assert not missing, missing
    got = net.apply({"params": merged["params"],
                     "batch_stats": merged["batch_stats"]},
                    jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("arch_d", ["Discriminator", "Discriminator2",
                                    "Discriminator4"])
def test_discriminator_parity(ref_model, rng, arch_d):
    torch.manual_seed(1)
    ref = getattr(ref_model, arch_d)(2).eval()
    hw = 224  # the reference adv_layer dims hardcode 224^2 inputs
    # (model.py:290: Linear(128*14*14), :385: Linear(32*28*28))
    x = rng.normal(size=(2, hw, hw, 2)).astype(np.float32)
    with torch.no_grad():
        # modern torch refuses .view on the non-contiguous transpose
        # (reference model.py:297 ran under torch 0.3)
        want = ref(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))).numpy()

    net = make_discriminator(arch_d)
    variables = net.init(jax.random.key(0), jnp.zeros((1, hw, hw, 2)),
                         train=False)
    params, bstats = _to_flax(ref, "discriminator")
    merged, missing = merge_variables(
        {"params": jax.tree.map(np.zeros_like, variables["params"]),
         "batch_stats": jax.tree.map(np.zeros_like,
                                     variables["batch_stats"])},
        {"params": params, "batch_stats": bstats}, strict_shapes=True)
    assert not missing, missing
    got = net.apply({"params": merged["params"],
                     "batch_stats": merged["batch_stats"]},
                    jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
