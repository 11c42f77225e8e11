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


def test_packed_small_family(rng):
    model = make_estimator("DenseNetSmall")
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x))
    packed = PackedDenseEstimator(variables["params"],
                                  widths=(32, 32, 24, 16, 8), s=2,
                                  dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(packed(x)), ref, atol=1e-4)
