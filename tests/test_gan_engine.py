"""GAN alternating-step semantics: which parameters move on which step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models import DMCNet
from dmcnet_tpu.train.engine import create_train_state
from dmcnet_tpu.train.engine_gan import make_gan_train_steps

B, S, H, W = 2, 1, 32, 32


@pytest.fixture(scope="module")
def setup():
    model = DMCNet(num_class=5, num_segments=S,
                   arch_estimator="DenseNetTiny", arch_d="Discriminator4",
                   detach_classifier=False)
    rng = np.random.default_rng(0)
    batch = {
        "mv": jnp.asarray(rng.normal(size=(B, S, H, W, 2)), jnp.float32),
        "residual": jnp.asarray(rng.normal(size=(B, S, H, W, 3)), jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(B, S, H, W, 2)), jnp.float32),
        "label": jnp.asarray([0, 3]),
    }
    state, opts = create_train_state(
        model, jax.random.key(0), batch, lr_cls_mult=0.01, lr_mse_mult=0.01,
        lr_d_mult=1.0)
    # jit without donation: these tests reuse the input state across calls
    # (the shipped jit=True steps donate it).
    d_step, g_step = make_gan_train_steps(
        model, opts, num_segments=S, lr_cls_w=1.0, lr_adv_g=1.0,
        lr_adv_d=1.0, lr_mse_w=1.0, jit=False)
    return model, batch, state, jax.jit(d_step), jax.jit(g_step)


def _moved(a, b):
    return any(not np.allclose(x, y)
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_d_step_moves_d_and_cls_not_gen(setup):
    model, batch, state, d_step, g_step = setup
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-3),
            jnp.float32(1e-3), jnp.float32(0.0))
    s1, m = d_step(state, batch, *args)
    assert np.isfinite(float(m["loss"]))
    assert _moved(s1.params["discriminator"], state.params["discriminator"])
    assert _moved(s1.params["base_model"], state.params["base_model"])
    assert not _moved(s1.params["gen_flow_model"],
                      state.params["gen_flow_model"])
    assert 0 <= float(m["acc_D_adv"]) <= 100


def test_g_step_moves_only_gen(setup):
    model, batch, state, d_step, g_step = setup
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-3),
            jnp.float32(1e-3), jnp.float32(0.0))
    s1, m = g_step(state, batch, *args)
    assert np.isfinite(float(m["loss"]))
    assert _moved(s1.params["gen_flow_model"], state.params["gen_flow_model"])
    assert not _moved(s1.params["discriminator"],
                      state.params["discriminator"])
    assert not _moved(s1.params["base_model"], state.params["base_model"])
    assert "loss_mse" in m


def test_frozen_cls_via_zero_lr(setup):
    model, batch, state, d_step, g_step = setup
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(0.0),
            jnp.float32(1e-3), jnp.float32(0.0))
    s1, _ = d_step(state, batch, *args)
    assert not _moved(s1.params["base_model"], state.params["base_model"])
    assert _moved(s1.params["discriminator"], state.params["discriminator"])
