"""Multi-device data-parallel train step on the virtual 8-CPU mesh."""

import jax
import numpy as np


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


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

    single = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                             lr_mse_w=1.0)
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
    for a, b_ in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
