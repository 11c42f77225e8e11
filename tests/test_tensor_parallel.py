"""Tensor (model) parallelism on a 2-D (data x model) virtual mesh.

No reference analogue (its only parallelism replicates the model,
code/dmcnet/train.py:117).  Pins: spec rules, numerics identical to the
single-device step for both engines, and the TP+FSDP combined placement
actually cutting per-device bytes along both axes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.parallel import (
    make_fsdp_eval_step,
    make_fsdp_train_step,
    make_mesh_2d,
    make_sharded_eval_step,
    make_mesh,
    replicate_state,
    shard_batch,
    shard_state_tp,
    tp_spec,
)


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(data=4, model=2)
    tree = {
        "conv": np.zeros((3, 3, 64, 128), np.float32),   # O on model
        "dense": np.zeros((512, 51), np.float32),        # O=51 odd -> none
        "bias": np.zeros((128,), np.float32),            # small -> repl
        "step": np.zeros((), np.int32),
    }
    specs = tp_spec(tree, mesh, min_size=1024)
    assert specs["conv"] == P(None, None, None, "model")
    assert specs["dense"] == P()
    assert specs["bias"] == P()
    assert specs["step"] == P()
    # with_fsdp also cuts a second dim over data
    specs = tp_spec(tree, mesh, min_size=1024, with_fsdp=True)
    assert specs["conv"] == P(None, None, "data", "model")
    assert specs["dense"] == P("data", None)


def _dmc_setup():
    from dmcnet_tpu.models import DMCNet
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
    step = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                           lr_mse_w=1.0, jit=False)
    return model, state, step, batch, jbatch


def test_tp_matches_single_device():
    """One train step on the 4x2 (data, model) mesh == single device (same
    atol as the data-parallel twin in test_parallel.py)."""
    model, state, step, batch, jbatch = _dmc_setup()
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    s1, m1 = step(state, jbatch, *args)

    mesh = make_mesh_2d(data=4, model=2)
    tstate, specs = shard_state_tp(state, mesh, min_size=256)
    tp_step = make_fsdp_train_step(step, mesh, specs)
    s2, m2 = tp_step(tstate, shard_batch(batch, mesh), *args)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_tp_fsdp_combined_cuts_both_axes():
    """with_fsdp=True: kernels sharded (model x data) hold 1/8 of their
    elements per device on the 4x2 mesh."""
    _, state, _, _, _ = _dmc_setup()
    mesh = make_mesh_2d(data=4, model=2)
    tstate, specs = shard_state_tp(state, mesh, min_size=256,
                                   with_fsdp=True)
    from jax.sharding import PartitionSpec as P

    n_both = 0
    for leaf, spec in zip(
            jax.tree.leaves(tstate),
            jax.tree.leaves(specs, is_leaf=lambda s: isinstance(s, P))):
        per_dev = leaf.addressable_shards[0].data.size
        axes = [p for p in tuple(spec) if p is not None]
        want = leaf.size
        if "model" in axes:
            want //= 2
        if "data" in axes:
            want //= 4
        assert per_dev == want, (spec, leaf.shape)
        if len(axes) == 2:
            n_both += 1
    assert n_both >= 5


def test_tp_eval_matches_replicated_eval():
    model, state, _, batch, jbatch = _dmc_setup()

    def eval_fn(state, batch):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        mv = batch["mv"].reshape((-1,) + batch["mv"].shape[-3:])
        res = batch["residual"].reshape((-1,) + batch["residual"].shape[-3:])
        logits, _ = model.apply(variables, mv, res, train=False)
        return logits

    mesh1 = make_mesh(jax.devices())
    repl_eval = make_sharded_eval_step(eval_fn, mesh1, replicate_out=True)
    l1 = repl_eval(replicate_state(state, mesh1), shard_batch(batch, mesh1))

    mesh = make_mesh_2d(data=4, model=2)
    tstate, specs = shard_state_tp(state, mesh, min_size=256,
                                   with_fsdp=True)
    tp_eval = make_fsdp_eval_step(eval_fn, mesh, specs, replicate_out=True)
    l2 = tp_eval(tstate, shard_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
