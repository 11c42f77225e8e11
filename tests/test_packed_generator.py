"""Packed (space-to-depth) generator must match the unpacked model exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.models import make_estimator
from dmcnet_tpu.ops.packed_generator import (
    PackedDenseEstimator,
    depth_to_space,
    space_to_depth,
)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    for s in (2, 4):
        packed = space_to_depth(x, s)
        assert packed.shape == (2, 8 // s, 12 // s, s * s * 5)
        np.testing.assert_array_equal(np.asarray(depth_to_space(packed, s)),
                                      np.asarray(x))


@pytest.mark.parametrize("s", [2, 4])
def test_packed_matches_unpacked(rng, s):
    model = make_estimator("DenseNetTiny")
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x))

    packed = PackedDenseEstimator(variables["params"], s=s,
                                  dtype=jnp.float32)
    got = np.asarray(packed(x))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_quantized_packed_close_to_f32(rng):
    from dmcnet_tpu.ops.packed_generator import QuantizedPackedEstimator

    model = make_estimator("DenseNetTiny")
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x))

    q = QuantizedPackedEstimator(variables["params"], calib_x=x, s=2)
    got = np.asarray(q(x))
    # int8 quantization noise must stay small relative to the signal.
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.05, rel


def test_pack_conv3x3_jnp_matches_numpy(rng):
    """The differentiable (train-time) pack transform must reproduce the
    numpy pack used by the serving path, for every layer shape of the dense
    family."""
    from dmcnet_tpu.ops.packed_generator import pack_conv3x3, pack_conv3x3_jnp

    segments = [5]
    for w_out in (8, 8, 6, 4, 2, None):  # None = predict_flow (2ch)
        c_out = 2 if w_out is None else w_out
        c_in = sum(segments)
        w = rng.normal(size=(3, 3, c_in, c_out)).astype(np.float32)
        b = rng.normal(size=(c_out,)).astype(np.float32)
        wp_np, bp_np = pack_conv3x3(w, b, 2, segments)
        wp_j, bp_j = pack_conv3x3_jnp(jnp.asarray(w), jnp.asarray(b), 2,
                                      segments)
        np.testing.assert_array_equal(np.asarray(wp_j), wp_np)
        np.testing.assert_array_equal(np.asarray(bp_j), bp_np)
        if w_out is not None:
            segments = [w_out] + segments


@pytest.mark.parametrize("arch", ["DenseNetTiny", "DenseNetSmall"])
def test_packed_training_mode_parity(rng, arch):
    """`packed=2` on the flax estimator: identical param tree/init, same
    forward, and matching gradients — training in packed layout is an exact
    reparameterization of the faithful model."""
    m0 = make_estimator(arch)
    m2 = make_estimator(arch, packed=2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 5)), jnp.float32)
    v0 = m0.init(jax.random.key(0), x)
    v2 = m2.init(jax.random.key(0), x)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), v0, v2))

    y0 = np.asarray(m0.apply(v0, x))
    y2 = np.asarray(m2.apply(v0, x))
    np.testing.assert_allclose(y2, y0, atol=1e-4)

    def loss(v, m):
        return jnp.mean(m.apply(v, x) ** 2)

    g0 = jax.grad(lambda v: loss(v, m0))(v0)
    g2 = jax.grad(lambda v: loss(v, m2))(v0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-2)


def test_packed_training_mode_odd_shape_fallback(rng):
    """H/W not divisible by s must fall back to the unpacked path (exact)."""
    m2 = make_estimator("DenseNetTiny", packed=2)
    x = jnp.asarray(rng.normal(size=(1, 15, 17, 5)), jnp.float32)
    v = m2.init(jax.random.key(0), x)
    m0 = make_estimator("DenseNetTiny")
    np.testing.assert_array_equal(np.asarray(m2.apply(v, x)),
                                  np.asarray(m0.apply(v, x)))


def test_packed_small_family(rng):
    model = make_estimator("DenseNetSmall")
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x))
    packed = PackedDenseEstimator(variables["params"],
                                  widths=(32, 32, 24, 16, 8), s=2,
                                  dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(packed(x)), ref, atol=1e-4)


@pytest.mark.parametrize("fuse", [False, True])
def test_input_affine_folding(rng, fuse):
    """input_affine absorbs the serving normalize into the conv weights:
    folded(raw) == unfolded(scale*raw + shift) everywhere — including the
    border ring, where SAME zero-padding means fewer raw taps carry the
    shift (the per-position bias plane credits in-bounds taps only)."""
    model = make_estimator("DenseNetTiny")
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 16, 16, 5), jnp.float32))
    raw = jnp.asarray(rng.integers(-128, 128, size=(2, 16, 16, 5)),
                      jnp.float32)
    scale = np.asarray([0.11, 0.11, 1 / 58.4, 1 / 57.1, 1 / 57.4],
                       np.float32)
    shift = np.asarray([0.0347, 0.0347, 0.0085, 0.0087, 0.0087], np.float32)
    normed = raw * scale + shift

    base = PackedDenseEstimator(variables["params"], s=2, dtype=jnp.float32,
                                fuse_mv_delta=fuse)
    folded = PackedDenseEstimator(variables["params"], s=2,
                                  dtype=jnp.float32, fuse_mv_delta=fuse,
                                  input_affine=(scale, shift))
    ref = np.asarray(base(normed))
    got = np.asarray(folded(raw))
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # the border ring must match too (regression guard for the tap-count
    # correction): compare it specifically at a tight tolerance
    ring = np.ones(ref.shape[1:3], bool)
    ring[1:-1, 1:-1] = False
    np.testing.assert_allclose(got[:, ring], ref[:, ring], atol=2e-4)


def test_repack_matches_s2d():
    """repack(s2d(x, 4), 4->2) == s2d(x, 2) exactly, for any channel
    count — the bridge from an s=4 generator into the s=2 stem."""
    import numpy as np

    from dmcnet_tpu.ops.packed_generator import repack, space_to_depth

    rng = np.random.default_rng(0)
    for c in (2, 3):
        x = rng.normal(size=(2, 16, 24, c)).astype(np.float32)
        a = np.asarray(repack(space_to_depth(x, 4), 4, 2, c))
        b = np.asarray(space_to_depth(x, 2))
        np.testing.assert_array_equal(a, b)
