"""Packed-stem + BN-folded ResNet-18 serving path: exact equivalence with
the training-layout model, and the packed end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.models import resnet18
from dmcnet_tpu.ops.packed_generator import space_to_depth
from dmcnet_tpu.ops.packed_resnet import PackedResNet18, pack_stem_conv


def _trained_like_variables(model, x, seed=0):
    """Init then perturb batch_stats so BN folding is non-trivial."""
    variables = model.init(jax.random.key(seed), x, train=False)
    rng = np.random.default_rng(seed)
    bs = jax.tree.map(
        lambda v: jnp.asarray(
            np.abs(rng.normal(0.5, 0.2, v.shape)).astype(np.float32) + 0.1),
        variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": bs}


def test_packed_stem_conv_exact(rng):
    """4x4/s1 packed stem == 7x7/s2 pad-3 conv, bit-level in f32."""
    from jax import lax

    w = rng.normal(size=(7, 7, 2, 64)).astype(np.float32)
    x = rng.normal(size=(2, 64, 64, 2)).astype(np.float32)
    ref = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wp = pack_stem_conv(w)
    got = lax.conv_general_dilated(
        space_to_depth(jnp.asarray(x), 2), jnp.asarray(wp), (1, 1),
        [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == ref.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_resnet_matches_flax(rng):
    model = resnet18(num_classes=11)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 2)), jnp.float32)
    variables = _trained_like_variables(model, x)
    ref = model.apply(variables, x, train=False)
    packed = PackedResNet18(variables, dtype=jnp.float32)
    got = packed(space_to_depth(x, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_pipeline_matches_unpacked(rng):
    """generator(packed_output) + packed mv + PackedResNet18 == unpacked."""
    from dmcnet_tpu.models import make_estimator
    from dmcnet_tpu.ops.packed_generator import PackedDenseEstimator

    hw = 64
    gen = make_estimator("DenseNetTiny")
    gv = gen.init(jax.random.key(0), jnp.zeros((1, hw, hw, 5), jnp.float32))
    cls = resnet18(num_classes=7)
    cls_vars = _trained_like_variables(cls, jnp.zeros((1, hw, hw, 2)),
                                       seed=1)

    mv = jnp.asarray(rng.normal(size=(3, hw, hw, 2)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(3, hw, hw, 3)), jnp.float32)
    x = jnp.concatenate([mv, res], axis=-1)

    unpacked_gen = PackedDenseEstimator(gv["params"], s=2,
                                        dtype=jnp.float32)
    ref = cls.apply(cls_vars, unpacked_gen(x) + mv, train=False)

    packed_gen = PackedDenseEstimator(gv["params"], s=2, dtype=jnp.float32,
                                      packed_output=True)
    packed_cls = PackedResNet18(cls_vars, dtype=jnp.float32)
    got = packed_cls(packed_gen(x) + space_to_depth(mv, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # bench.py's exact path: +mv fused into the predict_flow weights
    fused_gen = PackedDenseEstimator(gv["params"], s=2, dtype=jnp.float32,
                                     packed_output=True, fuse_mv_delta=True)
    got2 = packed_cls(fused_gen(x))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
