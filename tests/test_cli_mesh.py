"""Training CLI on the virtual 8-device mesh (batch size divisible by 8)."""

import os

import numpy as np
import pytest
from PIL import Image

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4

H, W, T = 96, 112, 26


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mesh")
    data_root = root / "videos"
    flow_root = root / "flow"
    rng = np.random.default_rng(13)
    lines = []
    for v in range(2):
        os.makedirs(data_root / "c", exist_ok=True)
        frames = (rng.integers(0, 256, size=(T, H, W, 3)) // 4 * 4).astype(
            np.uint8)
        encode_mpeg4(data_root / "c" / f"v{v}.mp4", frames, gop_size=12,
                     bit_rate=1_000_000)
        fdir = flow_root / "c" / f"v{v}"
        os.makedirs(fdir)
        for i in range(1, T + 1):
            for ax in "xy":
                Image.fromarray(rng.integers(0, 256, size=(H, W),
                                             dtype=np.uint8), "L").save(
                    fdir / f"flow_{ax}_{i:05d}.jpg")
        lines.append(f"c/v{v}.avi 0 {v}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return dict(data_root=str(data_root), flow_root=str(flow_root),
                list=str(lst))


def test_train_cli_uses_mesh(corpus, tmp_path, monkeypatch):
    import jax

    from dmcnet_tpu.cli import train as train_cli

    assert jax.device_count() == 8
    monkeypatch.chdir(tmp_path)
    args = [
        "--data-name", "hmdb51", "--data-root", corpus["data_root"],
        "--flow-root", corpus["flow_root"],
        "--representation", "mv", "--arch", "resnet18",
        "--arch_estimator", "DenseNetTiny", "--num_segments", "1",
        "--train-list", corpus["list"], "--test-list", corpus["list"],
        "--epochs", "1", "--batch-size", "8",  # 8 % 8 == 0 -> mesh path
        "--eval-freq", "1", "--workers", "2",
        "--model-prefix", str(tmp_path / "m"),
    ]
    best = train_cli.main(args, input_size=64)
    assert best >= 0.0
    assert os.path.exists(str(tmp_path / "m_mv_checkpoint.pth.tar"))


def test_train_cli_fsdp(corpus, tmp_path, monkeypatch):
    """--fsdp 1: full CLI epoch with ZeRO-3 state sharding — train, eval
    and the msgpack checkpoint save (which gathers sharded leaves) all run."""
    import jax

    from dmcnet_tpu.cli import train as train_cli

    assert jax.device_count() == 8
    monkeypatch.chdir(tmp_path)
    args = [
        "--data-name", "hmdb51", "--data-root", corpus["data_root"],
        "--flow-root", corpus["flow_root"],
        "--representation", "mv", "--arch", "resnet18",
        "--arch_estimator", "DenseNetTiny", "--num_segments", "1",
        "--train-list", corpus["list"], "--test-list", corpus["list"],
        "--epochs", "1", "--batch-size", "8", "--fsdp", "1",
        "--eval-freq", "1", "--workers", "2",
        "--model-prefix", str(tmp_path / "f"),
    ]
    best = train_cli.main(args, input_size=64)
    assert best >= 0.0
    assert os.path.exists(str(tmp_path / "f_mv_checkpoint.pth.tar"))
