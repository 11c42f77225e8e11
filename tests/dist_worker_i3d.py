"""Worker for test_multiprocess: one of two processes running the I3D
G train step + sharded eval over a mesh that spans both (2 CPU devices
each, 4 global).

Exercises the multi-host path of cli/train_i3d.py: jax.distributed
initialization, per-host shard assembly via global_batch_from_local with
batch_axis=1 (the stacked (iter_size, B, ...) microbatch layout), the XLA
cross-process gradient/BN collectives, and the replicate_out eval wrapper
that all-gathers logits for the score dump.  Reference equivalent: the
DDP vestige in the I3D trainer (code/dmcnet_I3D/train_model.py:117-118).

Usage: dist_worker_i3d.py <process_id> <coordinator> <out.npz>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

T, HW, B, ITER = 4, 32, 4, 2


def make_batch():
    import numpy as np

    rng = np.random.default_rng(0)
    return {
        "mv": np.asarray(rng.normal(size=(ITER, B, T, HW, HW, 2)),
                         np.float32),
        "residual": np.asarray(rng.normal(size=(ITER, B, T, HW, HW, 3)),
                               np.float32),
        "flow": np.asarray(rng.normal(size=(ITER, B, T, HW, HW, 2)),
                           np.float32),
        "label": (np.arange(ITER * B, dtype=np.int32) % 3).reshape(ITER, B),
    }


def make_state_and_steps(jit_mesh=None):
    import jax.numpy as jnp

    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
    from dmcnet_tpu.train.engine import TrainState
    from dmcnet_tpu.train.engine_i3d import (
        make_i3d_eval_step,
        make_i3d_optimizers,
        make_i3d_steps,
    )

    net = I3D(num_classes=3, modality="flow+mp4",
              arch_estimator="DenseNetTiny")
    x0 = jnp.zeros((1, T, HW, HW, 5), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    # SGD (the I3D trainer's default, train_model.py:133-146).  Adam with
    # eps=1e-8 would make this comparison meaningless: its first-step
    # update is ~lr*sign(g), and near-zero gradients at random init get
    # their sign flipped by benign summation-order noise, so ANY two
    # execution orders (even jit vs eager) diverge by +-lr per leaf.
    opts = make_i3d_optimizers(variables["params"], optim="sgd",
                               has_gan=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_cls=opts["cls"].init(variables["params"]),
                       opt_gf=opts["gf"].init(variables["params"]))
    # stop_gradient (NOT reference training semantics — a numerical
    # isolation device for this cross-process comparison): the generator
    # gradient comes only from the well-conditioned MSE path.  With the
    # CE gradient backpropagating through 22 train-mode BN layers at
    # random init (near-zero batch-variance channels), different
    # reduction orders legitimately shift generator grads by O(1) — no
    # tolerance would be meaningful.
    _, g_step = make_i3d_steps(net, opts, adv=0.0, jit=False,
                               stop_gradient=True, train_backbone=False)
    ev = make_i3d_eval_step(net, jit=False)
    return state, g_step, ev


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

    from dmcnet_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        make_sharded_train_step,
        replicate_state,
    )

    state, g_step, ev = make_state_and_steps()
    mesh = make_mesh(jax.devices())
    step = make_sharded_train_step(g_step, mesh, batch_axis=1)
    state = replicate_state(state, mesh)

    batch = make_batch()
    rows = list(local_shard_indices(B))
    local = jax.tree.map(lambda x: x[:, rows], batch)
    sharded = global_batch_from_local(local, mesh, batch_axis=1)
    # ONE step: the I3D loss landscape at random init is chaotic (a single
    # step can triple the loss), so iterating would amplify benign
    # collective-reassociation noise beyond any meaningful tolerance.  One
    # step measures exactly what this test is for: that the cross-process
    # wiring computes the same grads/updates as a local mesh.
    args = (jax.random.key(1), jnp.float32(1e-3), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(1e-4), jnp.asarray(False))
    state, metrics = step(state, sharded, *args)

    # The eval path of cli/train_i3d.py: replicate_out hands every process
    # the full logits/label rows.
    eval_step = make_sharded_eval_step(ev, mesh, replicate_out=True)
    ebatch = jax.tree.map(lambda x: x[0], batch)  # (B, ...) microbatch 0
    local_eval = jax.tree.map(lambda x: x[rows], ebatch)
    em = eval_step(state, global_batch_from_local(local_eval, mesh))
    logits = np.asarray(em["logits"])
    labels = np.asarray(em["label"])
    assert logits.shape == (B, 3) and labels.shape == (B,)

    if process_id == 0:
        flat = {f"p{i}": np.asarray(x)
                for i, x in enumerate(jax.tree.leaves(state.params))}
        flat["loss"] = np.float32(metrics["loss"])
        flat["eval_logits"] = logits
        flat["eval_labels"] = labels
        np.savez(out_path, **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
