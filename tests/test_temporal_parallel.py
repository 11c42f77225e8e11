"""Sequence (temporal) parallelism: T-sharded I3D == single-device, with
XLA-inserted halo exchanges (parallel/temporal.py; SURVEY §2.5 recipe)."""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
from dmcnet_tpu.parallel import (
    make_time_mesh,
    make_time_sharded_apply,
    place_time_sharded,
)


def test_time_sharded_i3d_matches_single_device(rng):
    net = I3D(num_classes=7, modality="flow+mp4",
              arch_estimator="DenseNetTiny")
    t, hw = 32, 32
    x = jnp.asarray(rng.normal(size=(2, t, hw, hw, 5)), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x)
    ref_logits, ref_gen = net.apply(variables, x, "flow+logit", False, False)

    mesh = make_time_mesh(jax.devices())
    assert len(mesh.devices) == 8
    apply_t = make_time_sharded_apply(
        lambda v, c: net.apply(v, c, "flow+logit", False, False), mesh)
    vs, xs = place_time_sharded(variables, x, mesh)
    logits, gen = apply_t(vs, xs)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gen), np.asarray(ref_gen),
                               atol=1e-4)
