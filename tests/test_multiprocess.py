"""True 2-process data parallelism: the dmcnet train step over a mesh
spanning two OS processes (gloo CPU collectives) must match the
single-process result (same global batch, same keys; tolerance covers
cross-process all-reduce summation order).

This is the real multi-host path of cli/train.py (--dist-* flags):
jax.distributed.initialize + per-host global_batch_from_local shards +
XLA cross-process collectives. Reference: DDP vestige,
code/dmcnet_I3D/train_model.py:117-120.
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_matches_single(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "dist.npz")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    repo = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dist_worker.py"),
             str(pid), coord, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = [w.communicate(timeout=900)[0].decode() for w in workers]
    for w, log in zip(workers, logs):
        assert w.returncode == 0, log[-3000:]
    got = np.load(out)

    # single-process reference: same model/batch/keys, no mesh
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine import create_train_state, make_train_step

    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny")
    rng = np.random.default_rng(0)
    b, hw = 4, 32
    batch = {
        "mv": jnp.asarray(rng.normal(size=(b, 1, hw, hw, 2)), jnp.float32),
        "residual": jnp.asarray(rng.normal(size=(b, 1, hw, hw, 3)),
                                jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(b, 1, hw, hw, 2)), jnp.float32),
        "label": jnp.asarray(np.arange(b, dtype=np.int32) % 5),
    }
    state, opts = create_train_state(model, jax.random.key(0), batch,
                                     lr_cls_mult=0.01, lr_mse_mult=0.01)
    step = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                           lr_mse_w=1.0, jit=False)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    for _ in range(2):
        state, metrics = step(state, batch, *args)

    # single-process reference for the multi-host eval path
    from dmcnet_tpu.train.engine import make_eval_step

    ev = make_eval_step(model, num_segments=1, lr_cls_w=1.0, lr_mse_w=1.0,
                        jit=False)
    em = ev(state, {**batch,
                    "weight": jnp.asarray([1, 1, 1, 0], jnp.float32)})
    np.testing.assert_allclose(float(got["eval_loss"]), float(em["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(got["eval_top1"]), float(em["top1"]),
                               atol=1e-6)

    # rtol covers gloo cross-process reduction reassociating the BN
    # two-pass variance sums differently than the local 4-device mesh
    np.testing.assert_allclose(float(got["loss"]), float(metrics["loss"]),
                               rtol=5e-5)
    leaves = jax.tree.leaves(state.params)
    assert len(leaves) == len([k for k in got.files if k.startswith("p")])
    for i, ref in enumerate(leaves):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(ref), atol=5e-5,
                                   err_msg=f"param leaf {i}")


def test_two_process_fsdp_tp_step_matches_single(tmp_path):
    """FSDP/TP state sharded ACROSS two processes (the cli/train.py
    --fsdp/--tp multi-host path): one train step on (a) the 4-device FSDP
    mesh and (b) the 2x2 (data, model) TP+ZeRO-3 mesh must match the same
    SPMD programs on a 4-device single-process mesh; the worker also pins
    the orbax contract those flags mandate — every process saves only its
    addressable shards and restores onto the same shardings bit-exactly."""
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "dist_fsdp.npz")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    repo = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dist_worker_fsdp.py"),
             str(pid), coord, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = [w.communicate(timeout=900)[0].decode() for w in workers]
    for w, log in zip(workers, logs):
        assert w.returncode == 0, log[-3000:]
    got = np.load(out)

    # single-process reference: the same sharded programs on a local
    # 4-device mesh (same placements, local collectives)
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.parallel import (
        make_fsdp_train_step,
        make_mesh,
        make_mesh_2d,
        shard_batch,
        shard_state_fsdp,
        shard_state_tp,
    )
    from dmcnet_tpu.train.engine import create_train_state, make_train_step

    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny")
    rng = np.random.default_rng(0)
    b, hw = 4, 32
    batch = {
        "mv": np.asarray(rng.normal(size=(b, 1, hw, hw, 2)), np.float32),
        "residual": np.asarray(rng.normal(size=(b, 1, hw, hw, 3)),
                               np.float32),
        "flow": np.asarray(rng.normal(size=(b, 1, hw, hw, 2)), np.float32),
        "label": np.arange(b, dtype=np.int32) % 5,
    }
    state, opts = create_train_state(
        model, jax.random.key(0), jax.tree.map(jnp.asarray, batch),
        lr_cls_mult=0.01, lr_mse_mult=0.01)
    # snapshot to host: the two placements below must not alias device
    # buffers the donated steps will delete (PERF_NOTES.md §4)
    state = jax.tree.map(np.asarray, state)
    raw = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                          lr_mse_w=1.0, jit=False)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))

    mesh = make_mesh(jax.devices()[:4])
    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)
    fstate, metrics = make_fsdp_train_step(raw, mesh, specs)(
        fstate, shard_batch(batch, mesh), *args)
    np.testing.assert_allclose(float(got["loss"]), float(metrics["loss"]),
                               rtol=5e-5)
    leaves = jax.tree.leaves(fstate.params)
    assert len(leaves) == len([k for k in got.files if k.startswith("p")])
    for i, ref in enumerate(leaves):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(ref), atol=5e-5,
                                   err_msg=f"fsdp param leaf {i}")

    mesh2 = make_mesh_2d(model=2, devices=jax.devices()[:4])
    tstate, tspecs = shard_state_tp(state, mesh2, min_size=256,
                                    with_fsdp=True)
    tstate, tmetrics = make_fsdp_train_step(raw, mesh2, tspecs)(
        tstate, shard_batch(batch, mesh2), *args)
    np.testing.assert_allclose(float(got["tp_loss"]),
                               float(tmetrics["loss"]), rtol=5e-5)
    tleaves = jax.tree.leaves(tstate.params)
    for i, ref in enumerate(tleaves):
        np.testing.assert_allclose(got[f"t{i}"], np.asarray(ref), atol=5e-5,
                                   err_msg=f"tp param leaf {i}")


def test_two_process_i3d_step_matches_single(tmp_path):
    """Multi-host path of cli/train_i3d.py: the I3D G step over the stacked
    (iter_size, B, ...) layout (batch_axis=1) across two processes must
    match a single-process mesh of the same size, and the replicate_out
    eval wrapper must hand both processes the full logits.

    The reference run is the SAME 4-shard SPMD program on a 4-device
    single-process mesh, so the only difference is the cross-process
    collective implementation (gloo) — an unsharded reference would also
    fold in batch-stat reduction reassociation through I3D's 22 train-mode
    BN layers, which is covered by test_parallel.py instead."""
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "dist_i3d.npz")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    repo = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dist_worker_i3d.py"),
             str(pid), coord, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = [w.communicate(timeout=900)[0].decode() for w in workers]
    for w, log in zip(workers, logs):
        assert w.returncode == 0, log[-3000:]
    got = np.load(out)

    # single-process reference: same model/batch/keys over a 4-device
    # local mesh with the identical batch_axis=1 sharding
    from dmcnet_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        make_sharded_train_step,
        replicate_state,
        shard_batch,
    )
    from tests.dist_worker_i3d import make_batch, make_state_and_steps

    state, g_step, ev = make_state_and_steps()
    mesh = make_mesh(jax.devices()[:4])
    step = make_sharded_train_step(g_step, mesh, batch_axis=1)
    state = replicate_state(state, mesh)
    batch = jax.tree.map(jnp.asarray, make_batch())
    sharded = shard_batch(batch, mesh, batch_axis=1)
    # one step, mirroring the worker (see dist_worker_i3d.py: the loss
    # landscape at random init is chaotic; iterating amplifies benign
    # collective-reassociation noise)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(1e-4), jnp.asarray(False))
    state, metrics = step(state, sharded, *args)

    np.testing.assert_allclose(float(got["loss"]), float(metrics["loss"]),
                               rtol=1e-5)
    eval_step = make_sharded_eval_step(ev, mesh, replicate_out=True)
    em = eval_step(state, shard_batch(jax.tree.map(lambda x: x[0], batch),
                                      mesh))
    # post-step logits fold the (slightly diverged) params AND batch_stats
    # back through 22 BN layers — tolerance reflects that amplification
    np.testing.assert_allclose(got["eval_logits"], np.asarray(em["logits"]),
                               atol=1e-3)
    np.testing.assert_array_equal(got["eval_labels"],
                                  np.asarray(em["label"]))
    leaves = jax.tree.leaves(state.params)
    assert len(leaves) == len([k for k in got.files if k.startswith("p")])
    for i, ref in enumerate(leaves):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(ref), atol=5e-5,
                                   err_msg=f"param leaf {i}")
