"""Host-chunked gradient accumulation == the monolithic in-step scan.

make_i3d_chunked_steps exists so the full reference recipe (clip 64 x
batch 3 x iter-size 32, /root/reference/code/dmcnet_I3D/train.sh) fits on
one chip: the monolithic (iter_size, B, ...) stack is ~8.6 GB of resident
input at that shape.  Chaining the scan over chunks must reproduce the
monolithic step exactly — same rng split chain, same batch_stats
threading, grad/metric sums reassociated only at chunk boundaries — and
these tests assert it, including the torch .grad carry across alternating
D/G macro steps (reference model.py:401-404,483-485 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
from dmcnet_tpu.train.engine import TrainState
from dmcnet_tpu.train.engine_i3d import (
    make_i3d_chunked_steps,
    make_i3d_optimizers,
    make_i3d_steps,
)

T, HW, B = 4, 32, 2


def _setup(has_gan, iter_size):
    net = I3D(num_classes=3, modality="flow+mp4",
              arch_estimator="DenseNetTiny",
              **({"arch_d": "Discriminator4"} if has_gan else {}))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, T, HW, HW, 5)), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    params, bstats = variables["params"], variables["batch_stats"]
    opts = make_i3d_optimizers(params, optim="sgd", has_gan=has_gan)
    state = TrainState(
        params=params, batch_stats=bstats,
        opt_cls=opts["cls"].init(params),
        opt_gf=opts["gf"].init(params),
        opt_d=opts["d"].init(params) if has_gan else None,
        grad_acc=(jax.tree.map(jnp.zeros_like, params) if has_gan
                  else None))
    batch = {
        "mv": jnp.asarray(
            rng.normal(size=(iter_size, B, T, HW, HW, 2)), jnp.float32),
        "residual": jnp.asarray(
            rng.normal(size=(iter_size, B, T, HW, HW, 3)), jnp.float32),
        "flow": jnp.asarray(
            rng.normal(size=(iter_size, B, T, HW, HW, 2)), jnp.float32),
        "label": jnp.asarray(
            (np.arange(iter_size * B) % 3).reshape(iter_size, B),
            jnp.int32),
    }
    return net, opts, state, batch


def _chunks(batch, sizes):
    out, at = [], 0
    for c in sizes:
        out.append(jax.tree.map(lambda x, a=at, c=c: x[a:a + c], batch))
        at += c
    assert at == next(iter(batch.values())).shape[0]
    return out


def _assert_states_match(a, b, tol=1e-4):
    """Scale-aware closeness: chunked differs from monolithic only by
    reassociation of sums whose TERMS are large (per-micro grads reach
    ~1e4 at random init) even where the RESULT is small (cancellation),
    so per-element rtol is the wrong yardstick — a bias grad summing to
    1e-3 out of 1e3-magnitude terms carries ~100x-eps x 1e3 of benign
    noise.  Bound |a-b| by tol x the leaf's own max magnitude (floor 1).
    The real chunking bugs this guards against show up as
    0.5%-of-magnitude divergences (seen when the test let noise compound
    across macro steps)."""
    flat_a, tree_a = jax.tree.flatten(a)
    flat_b, tree_b = jax.tree.flatten(b)
    assert tree_a == tree_b
    for la, lb in zip(flat_a, flat_b):
        la, lb = np.asarray(la), np.asarray(lb)
        assert la.shape == lb.shape
        if not la.size:
            continue
        scale = max(1.0, float(np.abs(lb).max()))
        diff = float(np.max(np.abs(la.astype(np.float64) - lb)))
        assert diff <= tol * scale, (la.shape, diff, scale)


def _host_copy(state):
    """Donation-safe snapshot: jitted steps donate their input state, so a
    state that must feed TWO computations is copied to host first
    (jax.device_put may alias instead of copy when placement matches)."""
    return jax.tree.map(lambda x: np.asarray(x), state)


def test_chunked_matches_monolithic_gan_alternating():
    """Alternating D/G macro steps with the torch .grad carry, ragged
    chunk split (4+2): params, batch_stats, optimizer moments, grad_acc
    and metrics all match the monolithic scan.

    Each phase starts both paths from the SAME (monolithic) state: the
    per-phase computations are equivalent up to grad-sum reassociation at
    chunk boundaries (~1e-6 relative — verified exactly equal metric-wise
    in eager mode), but the GAN loss landscape at random init is chaotic
    enough that letting the paths drift freely across TWO macro steps
    amplifies that noise ~1000x (same effect dist_worker_i3d.py documents
    for collective reassociation), which would test amplification, not
    correctness."""
    iter_size = 6
    net, opts, state_m, batch = _setup(True, iter_size)
    d_step, g_step = make_i3d_steps(net, opts, adv=0.1)
    d_accum, d_apply, g_accum, g_apply = make_i3d_chunked_steps(
        net, opts, adv=0.1)
    lrs = (jnp.float32(1e-2), jnp.float32(5e-3), jnp.float32(1e-3),
           jnp.float32(1e-4))

    for i, (step, accum, apply) in enumerate(
            ((d_step, d_accum, d_apply), (g_step, g_accum, g_apply))):
        rng = jax.random.key(7 + i)
        drop = jnp.asarray(i == 1)  # epoch-0 G loss drops the cls term
        state_c = _host_copy(state_m)  # same phase input for both paths
        state_m, metrics_m = step(_host_copy(state_m), batch, rng, *lrs,
                                  drop)
        carry = None
        for chunk in _chunks(batch, (4, 2)):
            carry = accum(state_c, chunk, rng, carry, drop)
        state_c, metrics_c = apply(state_c, carry, *lrs, drop)
        for k in metrics_m:
            np.testing.assert_allclose(
                float(metrics_m[k]), float(metrics_c[k]),
                atol=1e-5, rtol=1e-4, err_msg=k)
        # grad_acc holds UNDIVIDED cross-phase sums (magnitude ~1e2-1e5):
        # rtol carries the comparison there; params/moments sit near atol
        _assert_states_match(state_m, state_c)


def test_chunked_sharded_matches_monolithic():
    """The CLI path (--accum-chunk): mesh-wrapped chunked steps
    (make_sharded_chunked_steps — state/carry replicated, chunk sharded on
    B, one grad all-reduce per accum) == the monolithic
    make_sharded_train_step on the SAME mesh.

    The monolithic reference runs on the mesh too, deliberately: on the
    REAL I3D the meshed program's rounding differs from single-device
    (different conv tilings + psum orders), and at random init the
    21-layer BN backward amplifies that seed chaotically — the D step's
    backbone grads end up ~6x apart from single-device while loss_cls
    differs only 0.2% (loss_adv, through the shallow D head, is exact;
    both placements are equally-valid float programs of the same math —
    verified benign by the f64 twin of this comparison, where the loss
    gap collapses to 1e-10 and the worst param gap from ~1e2 to ~4e-5:
    pure rounding amplification, shrinking with precision).  Comparing
    both paths at the same placement isolates what this test is about:
    the CHUNKING."""
    from dmcnet_tpu.parallel import (
        make_mesh,
        make_sharded_chunked_steps,
        make_sharded_train_step,
        replicate_state,
        shard_batch,
    )
    from dmcnet_tpu.train.engine_i3d import make_i3d_chunked_steps

    iter_size = 4
    net, opts, state_m, batch = _setup(True, iter_size)
    _, _, state_c, _ = _setup(True, iter_size)
    raw_d, _ = make_i3d_steps(net, opts, adv=0.1, jit=False)
    mesh = make_mesh(jax.devices()[:2])
    d_step = make_sharded_train_step(raw_d, mesh, batch_axis=1)
    d_accum, d_apply, _, _ = make_sharded_chunked_steps(
        make_i3d_chunked_steps(net, opts, adv=0.1, jit=False), mesh)
    lrs = (jnp.float32(1e-2), jnp.float32(5e-3), jnp.float32(1e-3),
           jnp.float32(1e-4))
    rng = jax.random.key(11)
    drop = jnp.asarray(False)

    sharded = shard_batch(_host_copy(batch), mesh, batch_axis=1)
    state_m, _ = d_step(replicate_state(_host_copy(state_m), mesh),
                        sharded, rng, *lrs, drop)
    state_c = replicate_state(_host_copy(state_c), mesh)
    carry = None
    for chunk in _chunks(batch, (2, 2)):
        carry = d_accum(state_c, shard_batch(chunk, mesh, batch_axis=1),
                        rng, carry, drop)
    state_c, _ = d_apply(state_c, carry, *lrs, drop)
    _assert_states_match(state_m, state_c)


def test_chunked_matches_monolithic_no_gan():
    """No-GAN path (no grad carry, cls+gf optimizers both step in G)."""
    iter_size = 4
    net, opts, state_m, batch = _setup(False, iter_size)
    _, _, state_c, _ = _setup(False, iter_size)
    _, g_step = make_i3d_steps(net, opts, adv=0.0)
    _, _, g_accum, g_apply = make_i3d_chunked_steps(net, opts, adv=0.0)
    lrs = (jnp.float32(1e-2), jnp.float32(5e-3), jnp.float32(0.0),
           jnp.float32(1e-4))
    rng = jax.random.key(3)
    drop = jnp.asarray(False)

    state_m, _ = g_step(state_m, batch, rng, *lrs, drop)
    carry = None
    for chunk in _chunks(batch, (2, 2)):
        carry = g_accum(state_c, chunk, rng, carry, drop)
    state_c, _ = g_apply(state_c, carry, *lrs, drop)
    _assert_states_match(state_m, state_c)
