"""Multi-device data-parallel train step on the virtual 8-CPU mesh."""

import flax.linen as nn
import jax
import numpy as np
import pytest


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8, include_i3d=False)


@pytest.mark.slow
def test_dryrun_multichip_8_i3d():
    """Full I3D D+G steps on the mesh (minutes of XLA CPU compile; the
    driver's `python __graft_entry__.py` runs this path too)."""
    import __graft_entry__
    from dmcnet_tpu.parallel import make_mesh

    __graft_entry__._dryrun_i3d(make_mesh(jax.devices()), 8)


def test_sharded_matches_single_device():
    """One sharded step must agree with the single-device step."""
    import jax.numpy as jnp

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.parallel import (
        make_mesh, make_sharded_train_step, replicate_state, shard_batch)
    from dmcnet_tpu.train.engine import create_train_state, make_train_step

    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny")
    rng = np.random.default_rng(0)
    b, hw = 8, 32
    batch = {
        "mv": np.asarray(rng.normal(size=(b, 1, hw, hw, 2)), np.float32),
        "residual": np.asarray(rng.normal(size=(b, 1, hw, hw, 3)),
                               np.float32),
        "flow": np.asarray(rng.normal(size=(b, 1, hw, hw, 2)), np.float32),
        "label": np.arange(b, dtype=np.int32) % 5,
    }
    jbatch = jax.tree.map(jnp.asarray, batch)
    state, opts = create_train_state(model, jax.random.key(0), jbatch,
                                     lr_cls_mult=0.01, lr_mse_mult=0.01)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))

    # jit=False: the jitted step donates its input state, and `state` is
    # reused below for the sharded run.
    single = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                             lr_mse_w=1.0, jit=False)
    s1, m1 = single(state, jbatch, *args)

    mesh = make_mesh(jax.devices())
    raw = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                          lr_mse_w=1.0, jit=False)
    sharded_step = make_sharded_train_step(raw, mesh)
    s2, m2 = sharded_step(replicate_state(state, mesh),
                          shard_batch(batch, mesh), *args)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    # atol covers cross-device BN batch-stat reduction reassociation fed
    # through Adam's eps=1e-3 first-step amplification (two-pass variance
    # reassociates the mean subtraction too, layers.py batch_norm)
    for a, b_ in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


class _MiniI3D(nn.Module):
    """Tiny stand-in with the I3D interface (node multiplexing) so the
    engine_i3d scan/optimizer/sharding plumbing is testable in seconds —
    the real I3D graph takes minutes of XLA CPU compile (covered by the
    slow dryrun test above)."""

    num_classes: int = 5
    arch_d: str = "yes"

    @nn.compact
    def __call__(self, inp, node="logit", detach=False, train=True):
        import jax.numpy as jnp

        if node == "D":
            h = nn.Conv(4, (3, 3), name="discriminator")(inp)
            return nn.Dense(2, name="d_head")(h.mean(axis=(1, 2)))
        gen = nn.Conv(2, (3, 3), name="gen_flow_model")(inp)[..., :2]
        h = nn.BatchNorm(use_running_average=not train, name="bn")(gen)
        logits = nn.Dense(self.num_classes, name="classifier")(
            h.mean(axis=(1, 2, 3)))
        if node == "flow+logit":
            return logits, gen
        return logits


def test_i3d_stacked_batch_sharded_matches_single_device():
    """batch_axis=1 sharding of the (iter_size, B, ...) stacked layout must
    agree with the single-device step (mirrors the dmcnet test above for
    the I3D engine's scan-accumulated steps)."""
    import jax.numpy as jnp

    from dmcnet_tpu.parallel import (
        make_mesh, make_sharded_train_step, replicate_state, shard_batch)
    from dmcnet_tpu.train.engine import TrainState
    from dmcnet_tpu.train.engine_i3d import (
        make_i3d_optimizers, make_i3d_steps)

    net = _MiniI3D()
    rng = np.random.default_rng(0)
    iters, b, t, hw = 2, 8, 4, 16
    x0 = jnp.asarray(rng.normal(size=(1, t, hw, hw, 5)), jnp.float32)
    variables = net.init(jax.random.key(0), x0, "flow+logit", False, False)
    d_vars = net.init(jax.random.key(1),
                      jnp.zeros((1, hw, hw, 2)), "D", False, False)
    params = {**variables["params"], **d_vars["params"]}
    bstats = variables.get("batch_stats", {})
    opts = make_i3d_optimizers(params, optim="adam", has_gan=True)
    state = TrainState(params=params, batch_stats=bstats,
                       opt_cls=opts["cls"].init(params),
                       opt_gf=opts["gf"].init(params),
                       opt_d=opts["d"].init(params))
    batch = {
        "mv": np.asarray(rng.normal(size=(iters, b, t, hw, hw, 2)),
                         np.float32),
        "residual": np.asarray(rng.normal(size=(iters, b, t, hw, hw, 3)),
                               np.float32),
        "flow": np.asarray(rng.normal(size=(iters, b, t, hw, hw, 2)),
                           np.float32),
        "label": (np.arange(iters * b, dtype=np.int32) % 5).reshape(
            iters, b),
    }
    args = (jax.random.key(2), jnp.float32(1e-3), jnp.float32(1e-3),
            jnp.float32(2e-3), jnp.float32(1e-4), jnp.asarray(False))

    # jit=False: the jitted steps donate their input state, and `state` is
    # reused below for the sharded run.
    d_single, g_single = make_i3d_steps(net, opts, adv=1.0, jit=False)
    jbatch = jax.tree.map(jnp.asarray, batch)
    s1, _ = d_single(state, jbatch, *args)
    s1, m1 = g_single(s1, jbatch, *args)

    mesh = make_mesh(jax.devices())
    d_raw, g_raw = make_i3d_steps(net, opts, adv=1.0, jit=False)
    d_sh = make_sharded_train_step(d_raw, mesh, batch_axis=1)
    g_sh = make_sharded_train_step(g_raw, mesh, batch_axis=1)
    s2 = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh, batch_axis=1)
    s2, _ = d_sh(s2, sharded, *args)
    s2, m2 = g_sh(s2, sharded, *args)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
