"""Train-step semantics: loss routing, freeze phase, optimizer grouping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models import DMCNet
from dmcnet_tpu.train.engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from dmcnet_tpu.train.optimizers import (
    decay_mult_tree,
    lr_mult_tree,
    step_decay_lr,
)

B, S, H, W = 2, 2, 32, 32


@pytest.fixture(scope="module")
def setup():
    model = DMCNet(num_class=5, num_segments=S,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    rng = np.random.default_rng(0)
    batch = {
        "mv": jnp.asarray(rng.normal(size=(B, S, H, W, 2)), jnp.float32),
        "residual": jnp.asarray(rng.normal(size=(B, S, H, W, 3)), jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(B, S, H, W, 2)), jnp.float32),
        "label": jnp.asarray([0, 3]),
    }
    state, opts = create_train_state(
        model, jax.random.key(0), batch, lr_cls_mult=0.01, lr_mse_mult=0.01)
    # jit without donation: these tests reuse the input state across calls
    # (the shipped jit=True step donates it).
    step = jax.jit(make_train_step(model, opts, num_segments=S, lr_cls_w=1.0,
                                   lr_mse_w=1.0, jit=False))
    return model, batch, state, opts, step


def test_group_adam_matches_optax_and_masks_moments():
    """Owned leaves update exactly like optax Adam-with-L2-in-grad; unowned
    leaves keep shape-() moment placeholders (HBM masked to the group)."""
    import optax

    from dmcnet_tpu.train.optimizers import GroupAdam

    rng = np.random.default_rng(0)
    params = {
        "owned": {"kernel": jnp.asarray(rng.normal(size=(4, 3)),
                                        jnp.float32)},
        "other": {"kernel": jnp.asarray(rng.normal(size=(64, 64)),
                                        jnp.float32)},
    }
    lr_mults = lr_mult_tree(params, {"owned": 0.5})
    decay_mults = jax.tree.map(lambda _: 1.0, params)
    opt = GroupAdam(params, lr_mults, decay_mults, eps=1e-3)
    state = opt.init(params)
    # unowned moments are scalar placeholders, not (64, 64) arrays
    assert state["mu"]["other"]["kernel"].shape == ()
    assert state["mu"]["owned"]["kernel"].shape == (4, 3)

    ref = optax.scale_by_adam(eps=1e-3)
    ref_state = ref.init(params["owned"])
    p, lr, wd = params, jnp.float32(1e-2), jnp.float32(1e-4)
    for _ in range(3):
        grads = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), p)
        p_new, state = opt.update(grads, state, p, lr, wd)
        u = jax.tree.map(lambda g, q: g + wd * q,
                         grads["owned"], p["owned"])
        upd, ref_state = ref.update(u, ref_state)
        ref_owned = jax.tree.map(lambda q, du: q - lr * 0.5 * du,
                                 p["owned"], upd)
        np.testing.assert_allclose(p_new["owned"]["kernel"],
                                   ref_owned["kernel"], rtol=2e-6, atol=1e-7)
        np.testing.assert_array_equal(p_new["other"]["kernel"],
                                      p["other"]["kernel"])
        p = p_new


def test_group_sgd_masks_buffers():
    from dmcnet_tpu.train.optimizers import GroupSGD

    params = {"a": jnp.ones((8, 8)), "b": jnp.ones((16, 16))}
    lr_mults = {"a": 1.0, "b": 0.0}
    opt = GroupSGD(params, lr_mults, {"a": 1.0, "b": 1.0})
    state = opt.init(params)
    assert state["b"].shape == () and state["a"].shape == (8, 8)
    grads = {"a": jnp.full((8, 8), 0.1), "b": jnp.full((16, 16), 0.1)}
    p, state = opt.update(grads, state, params, jnp.float32(0.1),
                          jnp.float32(0.0))
    assert np.all(np.asarray(p["a"]) < 1.0)
    np.testing.assert_array_equal(p["b"], params["b"])


def test_bf16_mixed_precision_step():
    """--bf16: convs in bfloat16, params/BN stats stay f32, loss tracks f32
    within bf16 tolerance."""
    rng = np.random.default_rng(0)
    batch = {
        "mv": jnp.asarray(rng.normal(size=(B, S, H, W, 2)), jnp.float32),
        "residual": jnp.asarray(rng.normal(size=(B, S, H, W, 3)),
                                jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(B, S, H, W, 2)), jnp.float32),
        "label": jnp.asarray([0, 3]),
    }
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    losses = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        model = DMCNet(num_class=5, num_segments=S,
                       arch_estimator="DenseNetTiny", gen_flow_or_delta=1,
                       dtype=dt)
        state, opts = create_train_state(model, jax.random.key(0), batch,
                                         lr_cls_mult=0.01, lr_mse_mult=0.01)
        step = make_train_step(model, opts, num_segments=S, lr_cls_w=1.0,
                               lr_mse_w=1.0)
        for _ in range(3):
            state, m = step(state, batch, *args)
        losses[name] = float(m["loss"])
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(state.params))
        assert all(b.dtype == jnp.float32
                   for b in jax.tree.leaves(state.batch_stats))
    assert np.isfinite(losses["bf16"])
    assert abs(losses["bf16"] - losses["f32"]) / losses["f32"] < 0.15


def test_step_decay_lr():
    assert step_decay_lr(0.01, 0, [200, 300, 400], 0.1) == 0.01
    assert np.isclose(step_decay_lr(0.01, 250, [200, 300, 400], 0.1), 0.001)
    assert np.isclose(step_decay_lr(0.01, 450, [200, 300, 400], 0.1), 1e-5)


def test_mult_trees(setup):
    model, batch, state, opts, step = setup
    lm = lr_mult_tree(state.params, {"base_model": 0.5})
    leaves = jax.tree_util.tree_leaves_with_path(lm)
    for path, v in leaves:
        top = path[0].key
        assert v == (0.5 if top == "base_model" else 0.0)
    dm = decay_mult_tree(state.params)
    for path, v in jax.tree_util.tree_leaves_with_path(dm):
        assert v == (0.0 if path[-1].key == "bias" else 1.0)


def test_train_step_updates_and_freeze(setup):
    model, batch, state, opts, step = setup
    rng = jax.random.key(1)

    # Frozen phase: classifier params unchanged, generator params move.
    s1, metrics = step(state, batch, rng, jnp.float32(1e-3),
                       jnp.float32(1e-4), jnp.asarray(False))
    assert np.isfinite(metrics["loss"])
    cls_same = jax.tree.map(np.allclose, s1.params["base_model"],
                            state.params["base_model"])
    assert all(jax.tree.leaves(cls_same))
    gen_moved = jax.tree.map(
        lambda a, b: not np.allclose(a, b),
        s1.params["gen_flow_model"], state.params["gen_flow_model"])
    assert any(jax.tree.leaves(gen_moved))

    # Unfrozen: classifier moves too.
    s2, _ = step(state, batch, rng, jnp.float32(1e-3), jnp.float32(1e-4),
                 jnp.asarray(True))
    cls_moved = jax.tree.map(
        lambda a, b: not np.allclose(a, b),
        s2.params["base_model"], state.params["base_model"])
    assert any(jax.tree.leaves(cls_moved))


def test_loss_decreases(setup):
    model, batch, state, opts, step = setup
    rng = jax.random.key(2)
    losses = []
    s = state
    for i in range(8):
        s, m = step(s, batch, jax.random.fold_in(rng, i),
                    jnp.float32(1e-3), jnp.float32(0.0), jnp.asarray(True))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_eval_step(setup):
    model, batch, state, opts, step = setup
    eval_step = make_eval_step(model, num_segments=S, lr_cls_w=1.0,
                               lr_mse_w=1.0)
    m = eval_step(state, batch)
    assert m["logits"].shape == (B, 5)
    assert 0.0 <= float(m["top1"]) <= 100.0
