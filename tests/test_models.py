"""Shape/semantics tests for generators, discriminators, ResNet, DMCNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models import (
    DMCNet,
    make_discriminator,
    make_estimator,
    resnet18,
    segment_consensus,
)

H = W = 64  # small spatial size for fast tests (all nets are fully conv)


@pytest.mark.parametrize("arch", [
    "ContextNetwork", "DenseNet", "DenseNetSmall", "DenseNetTiny",
    "DenseNetTinyEarlyFusionSum", "DenseNetTinyEarlyFusionStack"])
def test_estimator_shapes(arch):
    model = make_estimator(arch)
    x = jnp.zeros((2, H, W, 5))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False,
                    mutable=["batch_stats"])[0] if "batch_stats" in variables \
        else model.apply(variables, x, train=False)
    assert y.shape == (2, H, W, 2)


def test_estimator_att_shapes():
    model = make_estimator("ContextNetwork", att=1)
    x = jnp.zeros((2, H, W, 5))
    variables = model.init(jax.random.key(0), x, train=False)
    flow, att = model.apply(variables, x, train=False)
    assert flow.shape == (2, H, W, 2) and att.shape == (2, H, W, 2)
    assert (np.asarray(att) >= 0).all()  # attention head ends in ReLU


def test_estimator_param_count_tiny():
    """DenseNetTiny channel plan 8/8/6/4/2 on 5 input channels
    (reference model.py:172-194)."""
    model = make_estimator("DenseNetTiny")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 5)))
    sizes = jax.tree.map(lambda a: a.size, variables["params"])
    total = sum(jax.tree.leaves(sizes))
    # conv_0: 5*9*8+8; conv_1: 13*9*8+8; conv_2: 21*9*6+6; conv_3: 27*9*4+4;
    # conv_4: 31*9*2+2; predict: 33*9*2+2
    expected = (5 * 9 * 8 + 8) + (13 * 9 * 8 + 8) + (21 * 9 * 6 + 6) + \
        (27 * 9 * 4 + 4) + (31 * 9 * 2 + 2) + (33 * 9 * 2 + 2)
    assert total == expected


@pytest.mark.parametrize("arch,expect_flat", [
    ("Discriminator", 128 * 14 * 14),
    ("Discriminator4", 32 * 28 * 28),
])
def test_discriminator_shapes(arch, expect_flat):
    model = make_discriminator(arch)
    x = jnp.zeros((2, 224, 224, 2))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 2)
    # The linear head must see the reference's flattened feature size.
    assert variables["params"]["adv_layer"]["kernel"].shape[0] == expect_flat


def test_resnet18_shapes_and_params():
    model = resnet18(num_classes=51)
    x = jnp.zeros((2, 224, 224, 2))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 51)
    n_params = sum(a.size for a in jax.tree.leaves(variables["params"]))
    # torchvision resnet18 with 2-ch conv1 and 51-class fc:
    # 11689512 (3ch/1000cls) - 64*7*7 (one conv1 input ch) - (512+1)*1000
    # + (512+1)*51
    expected = 11689512 - 64 * 7 * 7 + (512 + 1) * (51 - 1000)
    assert n_params == expected, (n_params, expected)


def test_segment_consensus():
    logits = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(6, 4)
    out = segment_consensus(logits, num_segments=3)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0], logits[:3].mean(0))


def test_dmcnet_forward():
    model = DMCNet(num_class=51, num_segments=3,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    mv = jnp.zeros((2, 3, H, W, 2))
    res = jnp.zeros((2, 3, H, W, 3))
    variables = model.init(jax.random.key(0), mv, res, train=False)
    logits, gen_flow = model.apply(variables, mv, res, train=False)
    assert logits.shape == (6, 51)
    assert gen_flow.shape == (6, H, W, 2)


def test_dmcnet_gan_forward():
    model = DMCNet(num_class=51, num_segments=1,
                   arch_estimator="DenseNetTiny", arch_d="Discriminator4",
                   detach_classifier=False)
    mv = jnp.zeros((2, 1, H, W, 2))
    res = jnp.zeros((2, 1, H, W, 3))
    flow = jnp.ones((2, 1, H, W, 2))
    variables = model.init(jax.random.key(0), mv, res, flow, train=False)
    logits, gen_flow, validity = model.apply(variables, mv, res, flow,
                                             train=False)
    assert validity.shape == (4, 2)  # fake‖real stacked on batch
    logits2, gen2, validity2 = model.apply(variables, mv, res, train=False)
    assert validity2.shape == (2, 2)


def test_detach_blocks_classifier_gradient():
    """No-GAN semantics: cls loss must not reach the generator
    (reference model.py:352 .detach())."""
    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny")
    mv = jnp.ones((1, 1, 32, 32, 2))
    res = jnp.ones((1, 1, 32, 32, 3))
    variables = model.init(jax.random.key(0), mv, res, train=False)

    def cls_loss(params):
        logits, _ = model.apply({**variables, "params": params}, mv, res,
                                train=False)
        return logits.sum()

    grads = jax.grad(cls_loss)(variables["params"])
    gen_grads = grads["gen_flow_model"]
    assert all(np.allclose(g, 0) for g in jax.tree.leaves(gen_grads))
    cls_grads = grads["base_model"]
    assert any(not np.allclose(g, 0) for g in jax.tree.leaves(cls_grads))
