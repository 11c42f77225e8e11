"""FULL-mode parity harness, executed end-to-end on synthetic stand-ins.

examples/parity/run.sh FULL mode is the exact command sequence that proves
accuracy parity the day real HMDB-51 + released checkpoints are mounted
(import 4 reference-format .pth.tar -> 25-seg/10-crop cli.test evals ->
cli.combine fusion -> accuracy assertion).  Until then this test keeps that
branch from bit-rotting: it builds a tiny synthetic MPEG-4 corpus, EXPORTS
four reference-format checkpoints through models/export_torch (the same
.pth.tar layout as the released models, reference train.py:372-377), and
drives run.sh with EXPECT_FULL=any — every command line of the FULL branch
runs for real; only the final accuracy compare is parameterized (synthetic
labels are noise; real data asserts 64.05, BASELINE.md).

TEST_FLAGS shrinks input_size/segments via argparse last-wins without
touching the real-data command lines (they stay 25-seg/10-crop defaults).
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_SH = os.path.join(REPO, "examples", "parity", "run.sh")

H, W, T, NVID = 96, 112, 30, 3


def _build_corpus(root):
    from dmcnet_tpu.codec.mpeg4 import encode_mpeg4

    data_root = root / "videos"
    os.makedirs(data_root / "cls", exist_ok=True)
    rng = np.random.default_rng(17)
    lines = []
    for v in range(NVID):
        frames = (rng.integers(0, 256, size=(T, H, W, 3)) // 4 * 4).astype(
            np.uint8)
        encode_mpeg4(data_root / "cls" / f"v{v}.mp4", frames, gop_size=12,
                     bit_rate=1_000_000)
        lines.append(f"cls/v{v}.avi 0 {v % 2}")
    test_list = root / "test.txt"
    test_list.write_text("\n".join(lines) + "\n")
    return str(data_root), str(test_list)


def _export_reference_ckpts(ckpt_dir, data_root, test_list, input_size=64):
    """Four reference-format .pth.tar checkpoints whose variable trees
    match the templates cli.test builds for run.sh's FULL command lines
    (same DMCNet constructor args per modality)."""
    import jax
    import jax.numpy as jnp

    from dmcnet_tpu.data.dmc_dataset import (BatchAssembler, CoviarDataset,
                                             augment_eval_batch)
    from dmcnet_tpu.models import DMCNet, PlainTSN
    from dmcnet_tpu.models.export_torch import save_reference_checkpoint
    from dmcnet_tpu.train.engine import TrainState, create_train_state

    os.makedirs(ckpt_dir, exist_ok=True)

    # the three plain modalities: CoViAR-style TSN checkpoints (base_model
    # only, per-modality conv1 channel counts — iframe 3 / mv 2 / res 3)
    for rep, in_ch in (("iframe", 3), ("mv", 2), ("residual", 3)):
        net = PlainTSN(num_class=51)
        variables = net.init(jax.random.key(0),
                             jnp.zeros((1, 1, input_size, input_size,
                                        in_ch)), train=False)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_cls=None, opt_gf=None)
        save_reference_checkpoint(state, os.path.join(ckpt_dir,
                                                      f"{rep}.pth.tar"))

    # the DMC stream: the GAN recipe's model (run.sh dmc_gan command line)
    net = DMCNet(num_class=51, num_segments=1, representation="mv",
                 arch="resnet18", arch_estimator="DenseNetTiny",
                 arch_d="Discriminator", gen_flow_or_delta=1,
                 detach_classifier=False)
    ds = CoviarDataset(
        data_root=data_root, flow_root="", video_list=test_list,
        representation="mv", num_segments=1, is_train=False,
        mv_minmaxnorm=1)
    asm = BatchAssembler(ds, input_size=input_size,
                         scale_size=input_size * 256 // 224, test_crops=1)
    sample = augment_eval_batch(asm.eval_batch([0]), representation="mv",
                                input_size=input_size)
    state, _ = create_train_state(net, jax.random.key(0), sample,
                                  lr_cls_mult=0.01, lr_mse_mult=0.01,
                                  lr_d_mult=0.01)
    save_reference_checkpoint(state,
                              os.path.join(ckpt_dir, "dmc_gan.pth.tar"))


@pytest.mark.slow
def test_parity_full_branch_on_synthetic_standins(tmp_path):
    data_root, test_list = _build_corpus(tmp_path)
    ckpt_dir = str(tmp_path / "ckpts")
    _export_reference_ckpts(ckpt_dir, data_root, test_list)

    out = str(tmp_path / "parity_out")
    env = {**os.environ,
           "DATA_ROOT": data_root, "TEST_LIST": test_list,
           "CKPTS": ckpt_dir, "OUT": out,
           "EXPECT_FULL": "any",
           "TEST_FLAGS": "--input_size 64 --test_segments 3",
           # the subprocess CLIs must run on CPU despite the axon pin
           "DMCNET_JAX_PLATFORM": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    proc = subprocess.run(["bash", RUN_SH], env=env, capture_output=True,
                          text=True, timeout=3000)
    assert proc.returncode == 0, \
        f"run.sh FULL failed:\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "PARITY OK [full pipeline split1]" in proc.stdout, proc.stdout
    assert "SKIP" not in proc.stdout, proc.stdout

    # the per-modality npz artifacts are combine-compatible and complete
    for rep in ("iframe", "mv", "residual", "dmc"):
        f = os.path.join(out, f"{rep}_score.npz")
        assert os.path.exists(f), f
        data = np.load(f, allow_pickle=True)
        assert len(data["names"]) == NVID
        assert data["scores"][0][0].shape == (1, 51)
