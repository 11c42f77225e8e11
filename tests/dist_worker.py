"""Worker for test_multiprocess: one of two processes running the dmcnet
train step over a mesh that spans both (2 CPU devices each, 4 global).

Exercises the real multi-host path of cli/train.py: jax.distributed
initialization, per-host shard assembly via global_batch_from_local, and
the XLA cross-process gradient/BN collectives (gloo on CPU; ICI/DCN on
TPU pods). Reference equivalent: the vestigial DDP branch
(code/dmcnet_I3D/train_model.py:117-120).

Usage: dist_worker.py <process_id> <coordinator> <out.npz>
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

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.parallel import make_mesh, make_sharded_train_step, \
        replicate_state
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

    mesh = make_mesh(jax.devices())
    raw = make_train_step(model, opts, num_segments=1, lr_cls_w=1.0,
                          lr_mse_w=1.0, jit=False)
    step = make_sharded_train_step(raw, mesh)
    state = replicate_state(state, mesh)
    # this host assembles only its own rows of the global batch
    idx = list(local_shard_indices(b))
    local = jax.tree.map(lambda x: x[idx], batch)
    sharded = global_batch_from_local(local, mesh)
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(1e-4),
            jnp.asarray(True))
    for _ in range(2):
        state, metrics = step(state, sharded, *args)

    # The multi-host EVAL path of cli/train.py: sharded eval step fed
    # per-host rows of a padded batch with a 0/1 weight mask.
    from dmcnet_tpu.parallel import make_sharded_eval_step
    from dmcnet_tpu.train.engine import make_eval_step

    ev = make_sharded_eval_step(
        make_eval_step(model, num_segments=1, lr_cls_w=1.0, lr_mse_w=1.0,
                       jit=False), mesh)
    weight = np.asarray([1, 1, 1, 0], np.float32)  # one padded row
    local_eval = {k: v[idx] for k, v in batch.items()}
    local_eval["weight"] = weight[idx]
    em = ev(state, global_batch_from_local(local_eval, mesh))

    if process_id == 0:
        flat = {f"p{i}": np.asarray(x)
                for i, x in enumerate(jax.tree.leaves(state.params))}
        flat["loss"] = np.float32(metrics["loss"])
        flat["eval_loss"] = np.float32(em["loss"])
        flat["eval_top1"] = np.float32(em["top1"])
        np.savez(out_path, **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
