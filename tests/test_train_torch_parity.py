"""Composed N-step train-loop A/B vs the REAL reference torch code.

Each case runs tests/ab_train_worker.py in a subprocess (float64 on both
frameworks — x64 must not leak into this session) where identical weights
and identical batch streams drive

  * our jitted engine (dmcnet_tpu.train.engine / engine_gan / engine_i3d)
  * the reference torch modules imported from /root/reference, stepped
    exactly like the reference train loops

and every parameter AND BatchNorm running-stat leaf must stay allclose
(rtol 1e-6) after every epoch.  This is the composition the unit tests
don't cover: jax.grad through the real model vs torch autograd, BN stat
evolution, the freeze->train flip at epoch_thre, the GAN D/G alternation,
and the I3D iter-size accumulation with cross-phase gradient carry-over.

Reference: code/dmcnet/train.py:205-288, code/dmcnet_GAN/train.py:219-380,
code/dmcnet_I3D/train/model.py:286-491.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

HERE = os.path.dirname(os.path.abspath(__file__))


def _run_worker(mode, tmp_path, timeout=2400):
    out = str(tmp_path / f"ab_{mode}.npz")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(HERE) + os.pathsep + \
        env.get("PYTHONPATH", "")
    env["JAX_LOGGING_LEVEL"] = "WARNING"
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "ab_train_worker.py"), mode,
         out],
        env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, \
        f"{mode} worker failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-4000:]}"
    assert "OK" in proc.stdout
    return np.load(out)


@pytest.mark.slow
def test_dmcnet_train_loop_matches_torch(tmp_path):
    """Two-optimizer loop + freeze flip at epoch_thre + BN running stats
    (reference code/dmcnet/train.py:205-288)."""
    diffs = _run_worker("dmcnet", tmp_path)
    # f64 traces should track at machine-epsilon scale; 1e-10 leaves three
    # orders of headroom while still catching any semantic drift.
    assert diffs["params"].max() < 1e-10
    assert diffs["batch_stats"].max() < 1e-10


@pytest.mark.slow
def test_gan_train_loop_matches_torch(tmp_path):
    """Even-D/odd-G alternation with three Adam optimizers
    (reference code/dmcnet_GAN/train.py:219-380)."""
    diffs = _run_worker("gan", tmp_path)
    assert diffs["params"].max() < 1e-10
    assert diffs["batch_stats"].max() < 1e-10


@pytest.mark.slow
def test_i3d_train_loop_matches_torch(tmp_path):
    """iter-size-accumulated D/G alternation with the torch .grad
    cross-phase carry-over, the stage-2 optimizer swap (D Adam state
    surviving it), the stage-1 base freeze, and the stale-lr scheduler
    quirks (reference code/dmcnet_I3D/train/model.py:267-491)."""
    diffs = _run_worker("i3d", tmp_path, timeout=3600)
    # looser than dmcnet/gan: a few borderline-ReLU elements in the 5c pool
    # branch flip on ~ulp conv noise at A/B shapes (worker docstring);
    # the drift stays ~1e-9 over 2 epochs — still 100x below f32 effects.
    assert diffs["params"].max() < 1e-7
    assert diffs["batch_stats"].max() < 1e-7
