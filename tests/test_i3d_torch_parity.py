"""Cross-framework parity: the REFERENCE torch I3D (imported straight from
/root/reference, never copied) vs our flax I3D with the same weights.

This is the strongest I3D-correctness evidence available without released
checkpoints: a randomly initialized reference network's state_dict is
imported through models.import_torch_i3d and both frameworks must produce
the same logits at the canonical input size (TF-SAME padding, BN eval
statistics, avg-pool geometry all bit-compatible)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmcnet_tpu.models.i3d import I3D
from dmcnet_tpu.models.import_torch import merge_variables
from dmcnet_tpu.models.import_torch_i3d import import_i3d_state_dict

_REF_NET_DIR = "/root/reference/code/dmcnet_I3D/network"


@pytest.mark.slow
def test_reference_torch_i3d_forward_parity(rng):
    sys.path.insert(0, _REF_NET_DIR)
    try:
        import i3d as ref_i3d
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    ref = ref_i3d.I3D(num_classes=7, modality="flow", dropout_prob=0.0)
    ref.eval()

    t, hw = 16, 224
    x = rng.normal(size=(1, t, hw, hw, 2)).astype(np.float32)
    with torch.no_grad():
        # reference is NCTHW
        out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    ref_logits = (out[0] if isinstance(out, tuple) else out).numpy()

    net = I3D(num_classes=7, modality="flow")
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.zeros((1, t, hw, hw, 2)),
                         "logit", False, False))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    imported, skipped = import_i3d_state_dict(ref.state_dict(),
                                              in_channels=2)
    assert not skipped, skipped
    merged, missing = merge_variables(zeros, imported, strict_shapes=True)
    assert not missing, missing

    got = net.apply(jax.tree.map(jnp.asarray, merged),
                    jnp.asarray(x), "logit", False, False)
    np.testing.assert_allclose(np.asarray(got), ref_logits,
                               rtol=1e-3, atol=1e-4)
