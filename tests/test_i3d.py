"""I3D model + trainer wiring tests.

Shape-level checks run through `jax.eval_shape` (graph construction without
compute), so the full 224x224x16 I3D graph is validated in seconds on CPU;
one small real step exercises numerics end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models.i3d import I3D, get_symbol, init_i3d_variables
from dmcnet_tpu.train.engine import TrainState
from dmcnet_tpu.train.engine_i3d import (
    make_i3d_eval_step,
    make_i3d_optimizers,
    make_i3d_steps,
)

T, HW = 16, 224


def _abstract_variables(model, sample):
    return jax.eval_shape(
        lambda: init_i3d_variables(model, jax.random.key(0), sample))


def test_i3d_forward_shapes():
    net, conf = get_symbol("I3D", modality="flow+mp4", num_classes=51,
                           arch_estimator="DenseNetTiny",
                           arch_d="Discriminator")
    assert conf["mean"] == [0.5, 0.5, 0.5]
    x = jnp.zeros((2, T, HW, HW, 5))
    variables = _abstract_variables(net, x)

    out = jax.eval_shape(
        lambda v, x: net.apply(v, x, "flow+logit", False, False),
        variables, x)
    logits, gen = out
    assert logits.shape == (2, 51)
    assert gen.shape == (2, T, HW, HW, 2)

    d_out = jax.eval_shape(
        lambda v, f: net.apply(v, f, "D", False, False),
        variables, jnp.zeros((2 * T, HW, HW, 2)))
    assert d_out.shape == (2 * T, 2)


def test_i3d_param_count():
    """Pure I3D backbone (no generator): Inception-3D with 400-dim bottleneck
    + 51-class head."""
    net = I3D(num_classes=51, modality="flow")
    x = jnp.zeros((1, T, HW, HW, 2))
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0), x, "logit", False, False))
    n = sum(int(np.prod(s.shape))
            for s in jax.tree.leaves(variables["params"]))
    # Kinetics I3D flow backbone ~12.3M params + 400*51 head.
    assert 12_000_000 < n < 13_000_000, n


def test_i3d_train_steps_wiring():
    """Full D/G step graphs at real clip size via eval_shape."""
    net = I3D(num_classes=5, modality="flow+mp4",
              arch_estimator="DenseNetTiny", arch_d="Discriminator4")
    x = jnp.zeros((1, T, HW, HW, 5))
    variables = jax.eval_shape(
        lambda: init_i3d_variables(net, jax.random.key(0), x))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          variables["params"])
    bstats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          variables["batch_stats"])
    opts = make_i3d_optimizers(params, optim="adam", has_gan=True)
    state = TrainState(params=params, batch_stats=bstats,
                       opt_cls=opts["cls"].init(params),
                       opt_gf=opts["gf"].init(params),
                       opt_d=opts["d"].init(params))
    iter_size = 2
    batch = {
        "mv": jnp.zeros((iter_size, 1, T, HW, HW, 2)),
        "residual": jnp.zeros((iter_size, 1, T, HW, HW, 3)),
        "flow": jnp.zeros((iter_size, 1, T, HW, HW, 2)),
        "label": jnp.zeros((iter_size, 1), jnp.int32),
    }
    d_step, g_step = make_i3d_steps(net, opts, adv=1.0, jit=False)
    args = (jax.random.key(0), jnp.float32(1e-3), jnp.float32(0.0),
            jnp.float32(2e-3), jnp.float32(1e-4), jnp.asarray(True))
    for fn in (d_step, g_step):
        new_state, metrics = jax.eval_shape(fn, state, batch, *args)
        assert metrics["loss"].shape == ()
        assert jax.tree.structure(new_state) == jax.tree.structure(state)


def test_i3d_stop_gradient_gates_cls_gradient_to_generator():
    """`stop_gradient=True` (the NON-reference fast mode; the reference's
    net-level detach branch i3d.py:573-576 is dead during training — fit
    never forwards the flag, model.py:355,414): the generator update must
    not depend on the classification labels — its gradient comes from the
    MSE (and adv) terms only.  Without it (reference semantics) the CE
    term reaches the generator through the stem and the updates differ."""
    t, hw = 4, 32
    net = I3D(num_classes=3, modality="flow+mp4",
              arch_estimator="DenseNetTiny")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, t, hw, hw, 5)), jnp.float32)
    variables = net.init(jax.random.key(0), x, "flow+logit", False, False)
    opts = make_i3d_optimizers(variables["params"], optim="sgd",
                               has_gan=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_cls=opts["cls"].init(variables["params"]),
                       opt_gf=opts["gf"].init(variables["params"]))
    base = {
        "mv": x[None, ..., :2], "residual": x[None, ..., 2:],
        "flow": jnp.asarray(rng.normal(size=(1, 1, t, hw, hw, 2)),
                            jnp.float32),
    }
    args = (jax.random.key(1), jnp.float32(1e-2), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(0.0), jnp.asarray(False))

    def gen_after(stop_grad, label):
        _, g_step = make_i3d_steps(net, opts, adv=0.0, jit=False,
                                   stop_gradient=stop_grad)
        batch = dict(base, label=jnp.asarray([[label]], jnp.int32))
        new_state, _ = g_step(state, batch, *args)
        return jax.tree.leaves(new_state.params["gen_flow_model"])

    a = gen_after(True, 0)
    b = gen_after(True, 2)
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    c = gen_after(False, 0)
    assert any(not np.array_equal(np.asarray(la), np.asarray(lc))
               for la, lc in zip(a, c))


def test_i3d_frozen_backbone_stage1_equivalence():
    """`train_backbone=False` (stage 1 + --detach): parameters after a G
    step must be bit-identical to the full step with lr1=0 — the backbone
    backward it skips only fed zero-lr updates."""
    t, hw = 4, 32
    net = I3D(num_classes=3, modality="flow+mp4",
              arch_estimator="DenseNetTiny", arch_d="Discriminator4")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, t, hw, hw, 5)), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x)
    opts = make_i3d_optimizers(variables["params"], optim="sgd",
                               has_gan=True)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_cls=opts["cls"].init(variables["params"]),
                       opt_gf=opts["gf"].init(variables["params"]),
                       opt_d=opts["d"].init(variables["params"]))
    batch = {
        "mv": x[None, ..., :2], "residual": x[None, ..., 2:],
        "flow": jnp.asarray(rng.normal(size=(1, 1, t, hw, hw, 2)),
                            jnp.float32),
        "label": jnp.asarray([[1]], jnp.int32),
    }
    args = (jax.random.key(1), jnp.float32(1e-2), jnp.float32(0.0),
            jnp.float32(2e-2), jnp.float32(1e-4), jnp.asarray(True))

    outs = {}
    for tb in (True, False):
        d_step, g_step = make_i3d_steps(net, opts, adv=1.0, jit=False,
                                        detach=True, train_backbone=tb)
        sd, md = d_step(state, batch, *args)
        sg, mg = g_step(sd, batch, *args)
        outs[tb] = (sg.params, md["loss"], mg["loss"])

    for a, b in zip(jax.tree.leaves(outs[True][0]),
                    jax.tree.leaves(outs[False][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(outs[True][1]) == float(outs[False][1])
    assert float(outs[True][2]) == float(outs[False][2])
    # and the fast path really left the backbone untouched
    for a, b in zip(jax.tree.leaves(outs[False][0]["conv3d_1a_7x7"]),
                    jax.tree.leaves(state.params["conv3d_1a_7x7"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_i3d_small_numeric_step():
    """One real G step on the smallest legal clip (memory/time bounded)."""
    net = I3D(num_classes=3, modality="flow+mp4",
              arch_estimator="DenseNetTiny")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, T, HW, HW, 5)), jnp.float32)
    variables = net.init(jax.random.key(0), x, "flow+logit", False, False)
    opts = make_i3d_optimizers(variables["params"], optim="adam",
                               has_gan=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_cls=opts["cls"].init(variables["params"]),
                       opt_gf=opts["gf"].init(variables["params"]))
    _, g_step = make_i3d_steps(net, opts, adv=0.0)
    batch = {
        "mv": x[None, ..., :2], "residual": x[None, ..., 2:],
        "flow": jnp.asarray(rng.normal(size=(1, 1, T, HW, HW, 2)),
                            jnp.float32),
        "label": jnp.asarray([[1]], jnp.int32),
    }
    # The jitted step donates the state buffers (PERF_NOTES.md §4) — snapshot
    # the generator leaves on host BEFORE calling it.
    gen_before = [np.asarray(a)
                  for a in jax.tree.leaves(state.params["gen_flow_model"])]
    new_state, metrics = g_step(
        state, batch, jax.random.key(1), jnp.float32(1e-3),
        jnp.float32(1e-3), jnp.float32(0.0), jnp.float32(1e-4),
        jnp.asarray(False))
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.allclose(np.asarray(a), b) for a, b in zip(
            jax.tree.leaves(new_state.params["gen_flow_model"]),
            gen_before))
    assert moved


def test_unroll_time_matches_conv3d():
    """The unroll_time lowering (3x3x3 as 3 shifted 2D convs, Unit3D._unrolled)
    shares the conv3d param tree exactly and matches its forward numerics."""
    import jax.tree_util as jtu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 64, 64, 2)), jnp.float32)
    plain = I3D(num_classes=5, modality="flow")
    unrolled = I3D(num_classes=5, modality="flow", unroll_time=True)
    v = init_i3d_variables(plain, jax.random.key(0), x)
    v2 = init_i3d_variables(unrolled, jax.random.key(0), x)
    s1 = {jtu.keystr(k): (tuple(a.shape), str(a.dtype))
          for k, a in jtu.tree_leaves_with_path(v["params"])}
    s2 = {jtu.keystr(k): (tuple(a.shape), str(a.dtype))
          for k, a in jtu.tree_leaves_with_path(v2["params"])}
    assert s1 == s2
    o1 = plain.apply(v, x, "logit", False, False)
    o2 = unrolled.apply(v, x, "logit", False, False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_i3d_dots_remat_matches_plain():
    """remat='dots' (save-conv-outs backward policy) changes only WHAT the
    backward stashes, never the math: loss and gradients must match the
    unrematerialized model bit-for-bit structure-wise and numerically."""
    t, hw = 4, 32
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, t, hw, hw, 5)), jnp.float32)
    label = jnp.asarray([0, 2], jnp.int32)

    def loss_with(remat):
        net = I3D(num_classes=3, modality="flow+mp4",
                  arch_estimator="DenseNetTiny", remat=remat)
        variables = net.init(jax.random.key(0), x, "flow+logit", False,
                             False)

        def loss_fn(params):
            (logits, gen), _ = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, "flow+logit", False, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            return (jnp.mean(optax_ce(logits, label))
                    + jnp.mean(gen ** 2))

        import optax

        def optax_ce(lg, lb):
            return optax.softmax_cross_entropy_with_integer_labels(lg, lb)

        return jax.value_and_grad(loss_fn)(variables["params"])

    l0, g0 = loss_with(False)
    l1, g1 = loss_with("dots")
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
