"""I3D data pipeline: clip datasets, samplers, device augmentation."""

import numpy as np
import pytest

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4
from dmcnet_tpu.data.lists import VideoItem
from dmcnet_tpu.data.sampling import RandomSampling, SequentialSampling
from dmcnet_tpu.data.video_iter import (
    I3DBatchAssembler,
    VideoClipDataset,
    i3d_augment_batch,
)

H, W, T = 128, 160, 40


@pytest.fixture(scope="module")
def items(tmp_path_factory):
    root = tmp_path_factory.mktemp("i3d")
    rng = np.random.default_rng(5)
    out = []
    for v in range(2):
        path = root / f"v{v}.avi"
        frames = (rng.integers(0, 256, size=(T, H, W, 3)) // 4 * 4).astype(
            np.uint8)
        encode_mpeg4(path, frames, gop_size=12, bit_rate=1_000_000)
        out.append(VideoItem(str(path), v, T, None))
    return out


@pytest.mark.parametrize("modality,ch", [
    ("flow+mp4", 7), ("mv", 2), ("res", 3), ("rgb", 3), ("I", 3)])
def test_clip_shapes(items, modality, ch):
    ds = VideoClipDataset(items, RandomSampling(num=8, seed=0),
                          modality=modality, mv_minmaxnorm=True)
    clip, label = ds[0]
    assert clip.shape == (8, H, W, ch)
    assert clip.dtype == np.uint8


def test_rgb_clip_from_h264_original(tmp_path):
    """rgb training straight off an untranscoded H.264 file — the reference
    capability (cv2 Video class, code/dmcnet_I3D/data/video_iterator.py:
    185-309) that round 3 flagged as missing; no MPEG-4 re-encode needed."""
    from dmcnet_tpu.codec.mpeg4 import encode_video
    rng = np.random.default_rng(11)
    path = tmp_path / "orig.mp4"
    frames = (rng.integers(0, 256, size=(T, H, W, 3)) // 4 * 4).astype(
        np.uint8)
    encode_video(path, frames, codec="libx264", gop_size=12,
                 bit_rate=2_000_000, container="mp4")
    items_ = [VideoItem(str(path), 0, T, None)]
    ds = VideoClipDataset(items_, RandomSampling(num=8, seed=0),
                          modality="rgb")
    clip, label = ds[0]
    assert clip.shape == (8, H, W, 3) and clip.dtype == np.uint8
    assert clip.std() > 1  # actual decoded content, not zero-fill


def test_sequential_eval_deterministic_cursor(items):
    samp = SequentialSampling(num=4, interval=1, fix_cursor=True,
                              shuffle=False)
    ds = VideoClipDataset(items, samp, modality="mv")
    a, _ = ds[0]
    b, _ = ds[0]
    np.testing.assert_array_equal(a, b)  # fix_cursor -> same clip


def test_fault_tolerance_backup(items):
    bad = VideoItem("/nonexistent/file.mp4", 0, 10, None)
    ds = VideoClipDataset([bad] + items, RandomSampling(num=4, seed=1),
                          modality="mv", max_retries=5, seed=3)
    clip, label = ds[0]  # retries onto a good item
    assert clip.shape[0] == 4


def test_assembler_and_augment(items):
    ds = VideoClipDataset(items, RandomSampling(num=4, seed=0),
                          modality="flow+mp4")
    asm = I3DBatchAssembler(ds, input_size=64, is_train=True)
    batch = asm.batch([0, 1])
    assert batch["frames"].shape == (2, 4, H, W, 7)
    parts = i3d_augment_batch(batch, modality="flow+mp4", ds_factor=16,
                              input_size=64)
    assert parts["mv"].shape == (2, 4, 64, 64, 2)
    assert parts["residual"].shape == (2, 4, 64, 64, 3)
    assert parts["flow"].shape == (2, 4, 64, 64, 2)
    # normalization (x/255 - .5)/.5 puts values in [-1, 1]
    assert float(np.abs(np.asarray(parts["mv"])).max()) <= 1.0 + 1e-6
    # blockified flow constant within 16x16 blocks
    f = np.asarray(parts["flow"])[0, 0, :16, :16, 0]
    assert np.allclose(f, f[0, 0], atol=1e-5)


def test_iterator_factory_creat(tmp_path):
    """creat() builds (train, val) from raw/list_cvt lists (reference
    iterator_factory.py:184-202, hardcoded prefixes replaced by args)."""
    import os

    from dmcnet_tpu.data.iterator_factory import creat

    os.makedirs(tmp_path / "raw" / "list_cvt")
    os.makedirs(tmp_path / "videos" / "cls")
    rng = np.random.default_rng(1)
    lines = []
    for v in range(3):
        frames = (rng.integers(0, 256, size=(14, 64, 64, 3)) // 4
                  * 4).astype(np.uint8)
        encode_mpeg4(tmp_path / "videos" / "cls" / f"v{v}.mp4", frames,
                     gop_size=12, bit_rate=500_000)
        lines.append(f"{v} {v} cls/v{v}.mp4")
    # one missing video: tolerated by skipping (reference retry logic)
    lines.append("9 0 cls/missing.mp4")
    for split in ("train", "test"):
        (tmp_path / "raw" / "list_cvt" /
         f"hmdb51_split1_{split}.txt").write_text("\n".join(lines) + "\n")

    train, val = creat("HMDB51", str(tmp_path), str(tmp_path / "videos"),
                       clip_length=4)
    assert len(train) == 3 and len(val) == 3
    clip, label = train[0]
    assert clip.shape == (4, 64, 64, 7) and clip.dtype == np.uint8
    clip_v, _ = val[1]
    assert clip_v.shape == (4, 64, 64, 7)


def test_info_cache(items, tmp_path):
    info = tmp_path / "info.json"
    ds1 = VideoClipDataset(items, RandomSampling(num=2, seed=0),
                           modality="mv", cached_info_path=str(info))
    assert info.exists()
    ds2 = VideoClipDataset(items, RandomSampling(num=2, seed=0),
                           modality="mv", cached_info_path=str(info))
    assert [i.num_frames for i in ds2.items] == \
        [i.num_frames for i in ds1.items]


def test_iterator_factory_creat_mv_and_registry(tmp_path):
    """`creat` builds train/val datasets from the reference list layout
    (iterator_factory.py:184-202, minus hardcoded cluster paths): lists at
    <data_root>/raw/list_cvt/<name>_split<k>_{train,test}.txt, missing
    videos tolerated, num_classes registry."""
    from dmcnet_tpu.data.iterator_factory import creat, dataset_num_classes

    rng = np.random.default_rng(7)
    videos = tmp_path / "videos"
    videos.mkdir()
    lists = tmp_path / "raw" / "list_cvt"
    lists.mkdir(parents=True)
    lines = []
    for v in range(3):
        frames = (rng.integers(0, 256, size=(20, 64, 80, 3)) // 4 * 4
                  ).astype(np.uint8)
        encode_mpeg4(videos / f"v{v}.mp4", frames, gop_size=12,
                     bit_rate=1_000_000)
        lines.append(f"{v} {v % 2} v{v}.avi")
    lines.append("9 0 missing.avi")  # tolerated: skipped at item build
    (lists / "hmdb51_split1_train.txt").write_text("\n".join(lines) + "\n")
    (lists / "hmdb51_split1_test.txt").write_text(lines[0] + "\n")

    train, val = creat("HMDB51", str(tmp_path), str(videos),
                       clip_length=6, modality="mv", mv_minmaxnorm=True)
    assert len(train) == 3 and len(val) == 1  # missing video dropped
    clip, label = train[1]
    assert clip.shape == (6, 64, 80, 2) and clip.dtype == np.uint8
    assert label == 1
    clip, _ = val[0]
    assert clip.shape == (6, 64, 80, 2)
    assert dataset_num_classes("HMDB51") == 51
    assert dataset_num_classes("ucf101") == 101
    with pytest.raises(ValueError):
        dataset_num_classes("kinetics700")
