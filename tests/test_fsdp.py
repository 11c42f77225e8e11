"""FSDP / ZeRO-3 state sharding on the virtual 8-CPU mesh.

The reference has no analogue (DataParallel replicates the model per GPU,
code/dmcnet/train.py:117); these tests pin the two properties that matter:
numerics identical to the replicated data-parallel step, and per-device
state bytes actually cut by the mesh size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.parallel import (
    make_mesh,
    make_sharded_eval_step,
    replicate_state,
    shard_batch,
)
from dmcnet_tpu.parallel.fsdp import (
    fsdp_spec,
    make_fsdp_eval_step,
    make_fsdp_train_step,
    shard_state_fsdp,
)


def test_fsdp_spec_rules():
    """Largest divisible dim is sharded; small / indivisible replicate."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(jax.devices())
    tree = {
        "conv": np.zeros((3, 3, 64, 128), np.float32),   # big, O divisible
        "bias": np.zeros((64,), np.float32),             # small -> repl
        "odd": np.zeros((999, 7), np.float32),           # indivisible
        "tall": np.zeros((256, 4), np.float32),          # dim0 divisible
        "step": np.zeros((), np.int32),
    }
    specs = fsdp_spec(tree, mesh, min_size=1024)
    assert specs["conv"] == P(None, None, None, "data")
    assert specs["bias"] == P()
    assert specs["odd"] == P()
    assert specs["tall"] == P("data", None)
    assert specs["step"] == P()


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


def test_fsdp_matches_single_device():
    """One FSDP step == the single-device step (same atol as the
    data-parallel twin in test_parallel.py — BN stat reassociation through
    Adam eps=1e-3)."""
    model, state, step, batch, jbatch = _dmc_setup()
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    s1, m1 = step(state, jbatch, *args)

    mesh = make_mesh(jax.devices())
    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)
    fsdp_step = make_fsdp_train_step(step, mesh, specs)
    s2, m2 = fsdp_step(fstate, shard_batch(batch, mesh), *args)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)
    # the updated state keeps its shards (reduce-scatter, not all-reduce)
    flat_specs = jax.tree.leaves(
        specs, is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec))
    flat_out = jax.tree.leaves(s2)
    assert any(s != jax.sharding.PartitionSpec() for s in flat_specs)
    def _norm(s):
        # XLA drops trailing Nones from output specs
        parts = tuple(s)
        while parts and parts[-1] is None:
            parts = parts[:-1]
        return parts

    for leaf, spec in zip(flat_out, flat_specs):
        assert _norm(leaf.sharding.spec) == _norm(spec)


def test_fsdp_cuts_per_device_bytes():
    """Sharded leaves hold 1/8 of their elements per device; whole-state
    per-device bytes land well under the replicated footprint."""
    _, state, _, _, _ = _dmc_setup()
    mesh = make_mesh(jax.devices())
    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)

    total = sharded_total = 0
    n_sharded = 0
    for leaf, spec in zip(
            jax.tree.leaves(fstate),
            jax.tree.leaves(specs, is_leaf=lambda s: isinstance(
                s, jax.sharding.PartitionSpec))):
        per_dev = leaf.addressable_shards[0].data.size
        total += leaf.size
        sharded_total += per_dev
        if spec != jax.sharding.PartitionSpec():
            n_sharded += 1
            assert per_dev == leaf.size // 8, (spec, leaf.shape)
        else:
            assert per_dev == leaf.size
    assert n_sharded >= 10
    # DenseNetTiny at 5 classes is tiny-leaf-heavy; even so the sharded
    # placement must hold clearly less than the replicated copy.
    assert sharded_total < 0.55 * total


def test_fsdp_orbax_roundtrip(tmp_path):
    """Orbax save from FSDP-sharded state (no host gather) -> restore into
    a sharded template keeps shardings AND values; a host-numpy template
    restores the same values as plain numpy (the eval drivers' path)."""
    from dmcnet_tpu.train.checkpoints import (
        load_checkpoint_orbax, save_checkpoint_orbax)

    _, state, _, _, _ = _dmc_setup()
    mesh = make_mesh(jax.devices())
    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)

    path = save_checkpoint_orbax(fstate, {"epoch": 3}, str(tmp_path / "ck"))

    restored, meta = load_checkpoint_orbax(fstate, path)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree.leaves(fstate), jax.tree.leaves(restored)):
        assert b.sharding == a.sharding, (a.shape, a.sharding, b.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    host_template = jax.tree.map(np.asarray, state)
    host_restored, _ = load_checkpoint_orbax(host_template, path)
    for a, b in zip(jax.tree.leaves(fstate), jax.tree.leaves(host_restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_orbax_async_roundtrip(tmp_path):
    """wait=False: save returns with the write in flight; after
    wait_for_checkpoints() the directory restores bit-exactly — and the
    snapshot reflects the state AT SAVE TIME even if the buffers are
    donated to a train step immediately afterwards."""
    from dmcnet_tpu.train.checkpoints import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
        wait_for_checkpoints,
    )

    _, state, step, batch, jbatch = _dmc_setup()
    mesh = make_mesh(jax.devices())
    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)
    want = [np.asarray(x) for x in jax.tree.leaves(fstate)]

    path = save_checkpoint_orbax(fstate, {"epoch": 5},
                                 str(tmp_path / "ck"), wait=False)
    # overwrite the live buffers while the background write drains
    fsdp_step = make_fsdp_train_step(step, mesh, specs)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    fstate2, _ = fsdp_step(fstate, shard_batch(batch, mesh), *args)
    wait_for_checkpoints()

    restored, meta = load_checkpoint_orbax(fstate2, path)
    assert meta["epoch"] == 5
    for a, b in zip(want, jax.tree.leaves(restored)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_orbax_commit_detection(tmp_path):
    """orbax_checkpoint_committed: True only after the atomic state/ rename
    — a torn dir (meta.pkl written, arrays interrupted) is not resumable."""
    import os

    from dmcnet_tpu.train.checkpoints import (
        orbax_checkpoint_committed,
        save_checkpoint_orbax,
    )

    torn = tmp_path / "torn.orbax"
    os.makedirs(torn)
    (torn / "meta.pkl").write_bytes(b"x")
    os.makedirs(torn / "state.orbax-checkpoint-tmp-123")  # in-flight write
    assert not orbax_checkpoint_committed(str(torn))

    path = save_checkpoint_orbax({"a": np.ones(4)}, {"epoch": 1},
                                 str(tmp_path / "ok.orbax"))
    assert orbax_checkpoint_committed(path)


def test_orbax_step_retention_and_fallback(tmp_path):
    """Every save lands in its own step dir: older committed checkpoints
    survive the write (no force-delete window), the newest `keep` are
    retained, and a torn newer step falls back to the last committed one."""
    import os

    from dmcnet_tpu.train.checkpoints import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    d = str(tmp_path / "ck.orbax")
    for epoch in (1, 2, 3):
        save_checkpoint_orbax({"a": np.full(4, float(epoch))},
                              {"epoch": epoch}, d)
    kept = sorted(n for n in os.listdir(d) if n.isdigit())
    assert kept == ["2", "3"]  # keep=2 pruned epoch 1

    # simulate a preemption mid-save of epoch 4: meta written, arrays torn
    os.makedirs(os.path.join(d, "4", "state.orbax-checkpoint-tmp-9"))
    with open(os.path.join(d, "4", "meta.pkl"), "wb") as f:
        f.write(b"torn")
    state, meta = load_checkpoint_orbax({"a": np.zeros(4)}, d)
    assert meta["epoch"] == 3  # newest COMMITTED step wins
    np.testing.assert_array_equal(np.asarray(state["a"]), np.full(4, 3.0))


def test_fsdp_eval_matches_replicated_eval():
    """Eval against FSDP-sharded state == eval against replicated state."""
    model, state, _, batch, jbatch = _dmc_setup()

    def eval_fn(state, batch):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        mv = batch["mv"].reshape((-1,) + batch["mv"].shape[-3:])
        res = batch["residual"].reshape((-1,) + batch["residual"].shape[-3:])
        logits, _ = model.apply(variables, mv, res, train=False)
        return logits

    mesh = make_mesh(jax.devices())
    repl_eval = make_sharded_eval_step(eval_fn, mesh, replicate_out=True)
    l1 = repl_eval(replicate_state(state, mesh), shard_batch(batch, mesh))

    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)
    fsdp_eval = make_fsdp_eval_step(eval_fn, mesh, specs, replicate_out=True)
    l2 = fsdp_eval(fstate, shard_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_fsdp_i3d_stacked_batch_matches_single_device():
    """The I3D engine's stacked (iter_size, B, ...) steps under FSDP ==
    single-device (mirrors the data-parallel twin in test_parallel.py)."""
    from dmcnet_tpu.train.engine import TrainState
    from dmcnet_tpu.train.engine_i3d import (
        make_i3d_optimizers, make_i3d_steps)
    from test_parallel import _MiniI3D

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

    d_single, g_single = make_i3d_steps(net, opts, adv=1.0, jit=False)
    jbatch = jax.tree.map(jnp.asarray, batch)
    s1, _ = d_single(state, jbatch, *args)
    s1, m1 = g_single(s1, jbatch, *args)

    mesh = make_mesh(jax.devices())
    d_raw, g_raw = make_i3d_steps(net, opts, adv=1.0, jit=False)
    fstate, specs = shard_state_fsdp(state, mesh, min_size=64)
    d_f = make_fsdp_train_step(d_raw, mesh, specs, batch_axis=1)
    g_f = make_fsdp_train_step(g_raw, mesh, specs, batch_axis=1)
    sharded = shard_batch(batch, mesh, batch_axis=1)
    s2, _ = d_f(fstate, sharded, *args)
    s2, m2 = g_f(s2, sharded, *args)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
