"""Worker for test_multiprocess: FSDP/TP state sharding ACROSS processes.

Two processes x 2 CPU devices = a 4-device mesh where params + optimizer
moments are ZeRO-3-sharded over processes (parallel/fsdp.py) — then the
same step on the 2x2 (data, model) TP mesh (parallel/tensor.py).  This is
the real multi-host path of `cli/train.py --fsdp/--tp --dist-*`, including
the orbax checkpoint contract those flags mandate: each process writes only
its addressable shards (no host gather) and restores back into the sharded
template (train/checkpoints.py).  Reference equivalent: none (DataParallel
replicates the model, code/dmcnet/train.py:117); the DDP vestige is
code/dmcnet_I3D/train_model.py:117-120.

Usage: dist_worker_fsdp.py <process_id> <coordinator> <out.npz>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main(process_id, coordinator, out_path):
    from dmcnet_tpu.parallel.multihost import (
        global_batch_from_local,
        initialize_distributed,
        local_shard_indices,
    )

    initialize_distributed(coordinator, num_processes=2,
                           process_id=process_id)
    assert jax.process_count() == 2 and jax.device_count() == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.parallel import (
        make_fsdp_train_step,
        make_mesh,
        make_mesh_2d,
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
    jbatch = jax.tree.map(jnp.asarray, batch)
    state, opts = create_train_state(model, jax.random.key(0), jbatch,
                                     lr_cls_mult=0.01, lr_mse_mult=0.01)
    # snapshot to host: the FSDP/TP placements below must not alias device
    # buffers the donated train steps will delete (PERF_NOTES.md §4)
    state = jax.tree.map(np.asarray, state)
    raw = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                          lr_mse_w=1.0, jit=False)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    idx = list(local_shard_indices(b))
    local = jax.tree.map(lambda x: x[idx], batch)

    # --- FSDP over the 4-device / 2-process mesh --------------------------
    mesh = make_mesh(jax.devices())
    fstate, specs = shard_state_fsdp(state, mesh, min_size=256)
    step = make_fsdp_train_step(raw, mesh, specs)
    sharded = global_batch_from_local(local, mesh)
    fstate, metrics = step(fstate, sharded, *args)

    # orbax checkpoint of the cross-process sharded state: every process
    # writes its shards, restore lands back on the same shardings
    from dmcnet_tpu.train.checkpoints import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    ckdir = os.path.join(os.path.dirname(out_path), "fsdp_ck")
    save_checkpoint_orbax(fstate, {"epoch": 7}, ckdir)
    restored, meta = load_checkpoint_orbax(fstate, ckdir)
    assert meta["epoch"] == 7
    for a, c in zip(jax.tree.leaves(fstate), jax.tree.leaves(restored)):
        assert c.sharding == a.sharding, (a.shape, a.sharding, c.sharding)
    rep = jax.jit(lambda s: s, out_shardings=NamedSharding(mesh, P()))
    diff = jax.tree.map(
        lambda a, c: jnp.max(jnp.abs(a.astype(jnp.float32) -
                                     c.astype(jnp.float32))),
        rep(fstate), rep(restored))
    assert max(float(x) for x in jax.tree.leaves(diff)) == 0.0

    # --- TP (2 data x 2 model) + ZeRO-3, spanning both processes ----------
    mesh2 = make_mesh_2d(model=2)
    tstate, tspecs = shard_state_tp(state, mesh2, min_size=256,
                                    with_fsdp=True)
    tp_step = make_fsdp_train_step(raw, mesh2, tspecs)
    tsharded = global_batch_from_local(local, mesh2)
    tstate, tmetrics = tp_step(tstate, tsharded, *args)

    # replication is a cross-process all-gather: EVERY process must execute
    # these programs (collectives deadlock when only one process runs them)
    frep = rep(fstate)
    trep = jax.jit(lambda s: s,
                   out_shardings=NamedSharding(mesh2, P()))(tstate)
    jax.block_until_ready((frep, trep))
    if process_id == 0:
        flat = {f"p{i}": np.asarray(x)
                for i, x in enumerate(jax.tree.leaves(frep.params))}
        flat.update({f"t{i}": np.asarray(x)
                     for i, x in enumerate(jax.tree.leaves(trep.params))})
        flat["loss"] = np.float32(metrics["loss"])
        flat["tp_loss"] = np.float32(tmetrics["loss"])
        np.savez(out_path, **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
