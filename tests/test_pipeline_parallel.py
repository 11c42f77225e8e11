"""GPipe pipeline parallelism (parallel/pipeline.py) on the 8-device mesh.

No reference analogue (its only parallelism replicates the model,
code/dmcnet/train.py:117).  Pins: the schedule equals the serial stage
composition, grads THROUGH the pipeline equal serial grads (pipeline
training, not just inference), per-device param bytes drop by the stage
count, and the microbatch count is a free knob.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.parallel import (
    make_pipeline_apply,
    make_stage_mesh,
    shard_stage_params,
    stack_stage_params,
    unstack_stage_params,
)

N_DEV = 8


def _conv_stage(params, x):
    """One homogeneous residual conv block: (B, H, W, C) -> same shape."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + jnp.tanh(y + params["b"])


def _make_params(rng, n, c=8):
    return [{"w": jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.3,
                              jnp.float32),
             "b": jnp.asarray(rng.normal(size=(c,)), jnp.float32)}
            for _ in range(n)]


def _serial(params_list, x):
    for p in params_list:
        x = _conv_stage(p, x)
    return x


def test_pipeline_matches_serial():
    rng = np.random.default_rng(0)
    params_list = _make_params(rng, N_DEV)
    x = jnp.asarray(rng.normal(size=(16, 6, 6, 8)), jnp.float32)

    mesh = make_stage_mesh(jax.devices())
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    pipe = make_pipeline_apply(_conv_stage, mesh)

    np.testing.assert_allclose(np.asarray(pipe(stacked, x)),
                               np.asarray(_serial(params_list, x)),
                               atol=1e-6)


def test_pipeline_microbatch_counts():
    """m is a free knob: any divisor of the batch (bubble fraction
    (n-1)/(m+n-1) is the only difference)."""
    rng = np.random.default_rng(1)
    params_list = _make_params(rng, N_DEV)
    x = jnp.asarray(rng.normal(size=(16, 4, 4, 8)), jnp.float32)
    want = np.asarray(_serial(params_list, x))

    mesh = make_stage_mesh(jax.devices())
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    for m in (2, 16):
        pipe = make_pipeline_apply(_conv_stage, mesh, n_microbatches=m)
        np.testing.assert_allclose(np.asarray(pipe(stacked, x)), want,
                                   atol=1e-6)


def test_pipeline_grad_matches_serial():
    """jax.grad through the schedule == serial grads: the backward replays
    the pipeline in reverse, so this IS pipeline-parallel training."""
    rng = np.random.default_rng(2)
    params_list = _make_params(rng, N_DEV)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 8)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(8, 4, 4, 8)), jnp.float32)

    mesh = make_stage_mesh(jax.devices())
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    pipe = make_pipeline_apply(_conv_stage, mesh, jit=False)

    def pipe_loss(p):
        return jnp.mean((pipe(p, x) - tgt) ** 2)

    def serial_loss(ps):
        return jnp.mean((_serial(ps, x) - tgt) ** 2)

    g_pipe = jax.jit(jax.grad(pipe_loss))(stacked)
    g_serial = jax.grad(serial_loss)(params_list)

    got = unstack_stage_params(g_pipe, N_DEV)
    for gs, gp in zip(g_serial, got):
        np.testing.assert_allclose(np.asarray(gs["w"]), gp["w"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs["b"]), gp["b"], atol=1e-5)


def test_pipeline_composes_with_data_parallel():
    """pp x dp on a 4x2 (stage, data) mesh: each stage is replicated twice
    and the microbatch batch dim splits over 'data' — forward AND grads
    equal the serial model (the grad psum over 'data' comes out of the
    shard_map transpose automatically)."""
    rng = np.random.default_rng(4)
    n_stages = 4
    params_list = _make_params(rng, n_stages)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 8)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(8, 4, 4, 8)), jnp.float32)

    mesh = make_stage_mesh(jax.devices(), data=2)
    assert dict(mesh.shape) == {"stage": 4, "data": 2}
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    pipe = make_pipeline_apply(_conv_stage, mesh, jit=False)

    np.testing.assert_allclose(np.asarray(jax.jit(pipe)(stacked, x)),
                               np.asarray(_serial(params_list, x)),
                               atol=1e-6)

    g_pipe = jax.jit(jax.grad(
        lambda p: jnp.mean((pipe(p, x) - tgt) ** 2)))(stacked)
    g_serial = jax.grad(
        lambda ps: jnp.mean((_serial(ps, x) - tgt) ** 2))(params_list)
    for gs, gp in zip(g_serial, unstack_stage_params(g_pipe, n_stages)):
        np.testing.assert_allclose(np.asarray(gs["w"]), gp["w"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs["b"]), gp["b"], atol=1e-5)


def test_pipeline_remat_grads_match():
    """remat=True recomputes stage activations in the backward; grads are
    identical to the non-remat pipeline (and thus to serial)."""
    rng = np.random.default_rng(5)
    params_list = _make_params(rng, N_DEV)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 8)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(8, 4, 4, 8)), jnp.float32)

    mesh = make_stage_mesh(jax.devices())
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    pipe_r = make_pipeline_apply(_conv_stage, mesh, jit=False, remat=True)

    g = jax.jit(jax.grad(
        lambda p: jnp.mean((pipe_r(p, x) - tgt) ** 2)))(stacked)
    g_serial = jax.grad(
        lambda ps: jnp.mean((_serial(ps, x) - tgt) ** 2))(params_list)
    for gs, gp in zip(g_serial, unstack_stage_params(g, N_DEV)):
        np.testing.assert_allclose(np.asarray(gs["w"]), gp["w"], atol=1e-5)


def test_pipeline_params_sharded_per_stage():
    """Each device stores exactly its stage's weights (model sharding)."""
    rng = np.random.default_rng(3)
    mesh = make_stage_mesh(jax.devices())
    stacked = shard_stage_params(
        stack_stage_params(_make_params(rng, N_DEV)), mesh)
    for leaf in jax.tree.leaves(stacked):
        assert leaf.addressable_shards[0].data.size == leaf.size // N_DEV
    # and the stacking round-trips
    back = unstack_stage_params(stacked, N_DEV)
    assert back[3]["w"].shape == (3, 3, 8, 8)


def _small_resnet_variables(num_classes=5, in_ch=2, hw=64):
    from dmcnet_tpu.models.resnet import resnet18

    model = resnet18(num_classes=num_classes)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, hw, hw, in_ch)), train=False)
    return model, variables


def test_hetero_pipeline_resnet18_matches_serial():
    """A REAL heterogeneous model through the GPipe schedule: eval-mode
    ResNet-18 split one residual stage per device (4 stages), params
    stage-sharded, activations in the flat rotating plane — logits must
    match the plain serial apply."""
    from dmcnet_tpu.parallel import make_pp_resnet18_apply, make_stage_mesh

    model, variables = _small_resnet_variables()
    mesh = make_stage_mesh(jax.devices()[:4])
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 64, 64, 2)), jnp.float32)
    pipe = make_pp_resnet18_apply(variables, 5, mesh)
    got = pipe(x)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_hetero_pipeline_resnet18_pp_x_dp():
    """4 pipeline stages x 2-way data parallelism on the full 8-device
    mesh — the microbatch batch dim additionally splits over 'data'."""
    from dmcnet_tpu.parallel import make_pp_resnet18_apply, make_stage_mesh

    model, variables = _small_resnet_variables()
    mesh = make_stage_mesh(jax.devices(), data=2)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(16, 64, 64, 2)), jnp.float32)
    pipe = make_pp_resnet18_apply(variables, 5, mesh)
    got = pipe(x)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def _hetero_grads_vs_serial(n_stages, n_devices, seed, lr=None):
    """jax.grad THROUGH make_hetero_pipeline_apply on the real ResNet-18
    parameter tree == serial grads, per leaf; optionally follow with one
    SGD step and check the updated pipeline forward == the updated serial
    forward (pipeline-parallel training on a real heterogeneous model)."""
    from dmcnet_tpu.parallel import make_stage_mesh
    from dmcnet_tpu.parallel.pipeline import (flatten_tree,
                                              make_hetero_pipeline_apply)
    from dmcnet_tpu.parallel.pp_resnet import resnet18_stage_split

    model, variables = _small_resnet_variables()
    mesh = make_stage_mesh(jax.devices()[:n_devices])
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(8, 64, 64, 2)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(8, 5)), jnp.float32)

    fns, svars = resnet18_stage_split(variables, 5, n_stages=n_stages)
    run, stacked = make_hetero_pipeline_apply(fns, svars, mesh, jit=False)

    def pipe_loss(vec):
        return jnp.mean((run(vec, x) - tgt) ** 2)

    def serial_loss(v):
        return jnp.mean((model.apply(v, x, train=False) - tgt) ** 2)

    g_vec = jax.jit(jax.grad(pipe_loss))(stacked)
    g_serial = jax.grad(serial_loss)(variables)

    # unflatten each stage's grad slice back to its variable tree and
    # compare leaf-by-leaf against the serial grads (params AND the
    # batch_stats constants, which get real gradients in eval mode)
    g_np = np.asarray(g_vec)
    for i, sv in enumerate(svars):
        vec_i, unflat = flatten_tree(sv)
        g_tree = unflat(jnp.asarray(g_np[i, :vec_i.shape[0]]))
        for coll, mods in g_tree.items():
            for mod, sub in mods.items():
                want = jax.tree.map(np.asarray, g_serial[coll][mod])
                got = jax.tree.map(np.asarray, sub)
                for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
                    np.testing.assert_allclose(g, w, rtol=5e-3, atol=2e-5)

    if lr is not None:
        # one SGD step on the stacked parameter plane vs the serial tree:
        # the trained pipeline forward must equal the trained serial model
        stacked2 = stacked - lr * g_vec
        v2 = jax.tree.map(lambda p, g: p - lr * g, variables, g_serial)
        np.testing.assert_allclose(
            np.asarray(run(stacked2, x)),
            np.asarray(model.apply(v2, x, train=False)),
            rtol=2e-4, atol=5e-5)


def test_hetero_pipeline_resnet18_grads_match_serial():
    """Pipeline-parallel TRAINING on the real model: grads through the
    4-stage hetero schedule == serial grads, and one optimizer step keeps
    the pipeline == the serially-trained model."""
    _hetero_grads_vs_serial(n_stages=4, n_devices=4, seed=7, lr=0.05)


def test_hetero_pipeline_two_stage_grads_match_serial():
    """Same for the 2-stage split ([stem+l1+l2] [l3+l4+head])."""
    _hetero_grads_vs_serial(n_stages=2, n_devices=2, seed=8)


def test_hetero_pipeline_two_stage_split():
    """The 2-stage split ([stem+l1+l2] [l3+l4+head]) on a 2-device mesh,
    with more microbatches than stages (m=4)."""
    from dmcnet_tpu.parallel import make_pp_resnet18_apply, make_stage_mesh

    model, variables = _small_resnet_variables()
    mesh = make_stage_mesh(jax.devices()[:2])
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(8, 64, 64, 2)), jnp.float32)
    pipe = make_pp_resnet18_apply(variables, 5, mesh, n_microbatches=4)
    got = pipe(x)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
