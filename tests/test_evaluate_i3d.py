"""CPU-scale e2e for the I3D video-level eval driver: score-dict averaging,
padded ragged batches, npz dump (reference
test/evaluate_video_hmdb_i3d.py:205-242)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4

T_FRAMES, H, W = 24, 64, 80
N_VIDS = 5


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("i3d_eval")
    os.makedirs(root / "raw" / "list_cvt")
    os.makedirs(root / "videos" / "cls")
    rng = np.random.default_rng(9)
    lines = []
    for v in range(N_VIDS):
        frames = (rng.integers(0, 256, size=(T_FRAMES, H, W, 3)) // 4
                  * 4).astype(np.uint8)
        encode_mpeg4(root / "videos" / "cls" / f"v{v}.mp4", frames,
                     gop_size=12, bit_rate=1_000_000)
        lines.append(f"{v} {v % 3} cls/v{v}.mp4")
    (root / "raw" / "list_cvt" / "hmdb51_split1_test.txt").write_text(
        "\n".join(lines) + "\n")
    return root


def test_evaluate_video_i3d(corpus, tmp_path):
    from dmcnet_tpu.cli.evaluate_video_i3d import main
    from dmcnet_tpu.models.i3d import get_symbol, init_i3d_variables
    from dmcnet_tpu.train.checkpoints import save_checkpoint
    from dmcnet_tpu.train.engine import TrainState
    from dmcnet_tpu.train.engine_i3d import make_i3d_optimizers

    # checkpoint as train_i3d would save it: FULL optimizer state included
    # (the eval driver must restore params/batch_stats from it regardless)
    net, _ = get_symbol("I3D", modality="flow+mp4", num_classes=51,
                        arch_estimator="DenseNetTiny")
    x0 = jnp.zeros((1, 8, 64, 64, 5))
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    opts = make_i3d_optimizers(variables["params"], optim="sgd")
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_cls=opts["cls"].init(variables["params"]),
                       opt_gf=opts["gf"].init(variables["params"]))
    ckpt = str(tmp_path / "i3d_ep-0001.pth")
    save_checkpoint(state, {"epoch": 1, "top1": 0.0}, ckpt)

    score_file = str(tmp_path / "i3d_scores")
    top1 = main([
        "--dataset", "HMDB51", "--data-root", str(corpus),
        "--video-prefix", str(corpus / "videos"),
        "--modality", "flow+mp4", "--arch-estimator", "DenseNetTiny",
        "--clip-length", "8", "--num-sample", "2", "--batch-size", "2",
        "--input-size", "64",
        "--load-weights", ckpt, "--score-file", score_file])
    assert 0.0 <= top1 <= 100.0

    with np.load(score_file + ".npz") as data:
        scores_msgpack = np.asarray(data["scores"])
        assert data["scores"].shape == (N_VIDS, 51)
        assert data["labels"].shape == (N_VIDS,)
        assert list(data["labels"]) == [v % 3 for v in range(N_VIDS)]
        assert np.isfinite(data["scores"]).all()
        # num_sample averaging happened (scores are means of two rounds)
        assert float(data["top1"]) == top1

    # same eval from an orbax training checkpoint (--ckpt-backend orbax)
    from dmcnet_tpu.train.checkpoints import save_checkpoint_orbax

    ckdir = save_checkpoint_orbax(state, {"epoch": 1, "top1": 0.0},
                                  str(tmp_path / "i3d_ck.orbax"))
    top1_o = main([
        "--dataset", "HMDB51", "--data-root", str(corpus),
        "--video-prefix", str(corpus / "videos"),
        "--modality", "flow+mp4", "--arch-estimator", "DenseNetTiny",
        "--clip-length", "8", "--num-sample", "2", "--batch-size", "2",
        "--input-size", "64",
        "--load-weights", ckdir, "--score-file",
        str(tmp_path / "i3d_scores_o")])
    assert top1_o == top1
    with np.load(str(tmp_path / "i3d_scores_o") + ".npz") as data:
        np.testing.assert_allclose(np.asarray(data["scores"]),
                                   scores_msgpack, atol=1e-6)
