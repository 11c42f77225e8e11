"""End-to-end CoviarDataset test on a synthetic encoded video + flow JPEGs."""

import os

import numpy as np
import pytest
from PIL import Image

from dmcnet_tpu.codec.mpeg4 import encode_mpeg4
from dmcnet_tpu.data.dmc_dataset import (
    BatchAssembler,
    CoviarDataset,
    augment_eval_batch,
    augment_train_batch,
)
from dmcnet_tpu.data.lists import VideoItem

H, W, T = 128, 160, 36


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(3)
    items = []
    for v in range(2):
        path = root / f"vid{v}.avi"
        frames = rng.integers(0, 256, size=(T, H, W, 3)).astype(np.uint8)
        # Smooth for encodability.
        frames = (frames // 4 * 4)
        encode_mpeg4(path, frames, gop_size=12, bit_rate=2_000_000)
        flow_dir = root / f"flow{v}"
        os.makedirs(flow_dir)
        for i in range(1, T + 1):
            for ax in "xy":
                Image.fromarray(
                    rng.integers(0, 256, size=(H, W), dtype=np.uint8)
                    .astype(np.uint8), mode="L").save(
                        flow_dir / f"flow_{ax}_{i:05d}.jpg")
        items.append(VideoItem(str(path), v, T, str(flow_dir)))
    return items


def test_train_pipeline(corpus):
    ds = CoviarDataset(None, None, None, "mv", num_segments=3, is_train=True,
                       accumulate=True, mv_minmaxnorm=1, items=corpus)
    frames, label, size = ds[0]
    assert frames.shape == (3, H, W, 7) and frames.dtype == np.uint8
    assert size == (H, W)

    asm = BatchAssembler(ds, input_size=64, scale_size=74)
    batch = asm.train_batch(range(4))
    assert batch["frames"].shape == (4, 3, H, W, 7)
    parts = augment_train_batch(batch, "mv", input_size=64)
    assert parts["mv"].shape == (4, 3, 64, 64, 2)
    assert parts["residual"].shape == (4, 3, 64, 64, 3)
    assert parts["flow"].shape == (4, 3, 64, 64, 2)
    assert parts["label"].shape == (4,)
    assert np.isfinite(np.asarray(parts["mv"])).all()


def test_eval_pipeline_10crop(corpus):
    ds = CoviarDataset(None, None, None, "mv", num_segments=2, is_train=False,
                       accumulate=True, items=corpus)
    asm = BatchAssembler(ds, input_size=64, scale_size=74, test_crops=10)
    batch = asm.eval_batch([0, 1])
    assert batch["scales"].shape == (2, 10, 2)
    parts = augment_eval_batch(batch, "mv", input_size=64)
    # crops folded into segment axis: 10 crops x 2 segments.
    assert parts["mv"].shape == (2, 20, 64, 64, 2)
    assert list(np.asarray(parts["label"])) == [0, 1]


def test_eval_deterministic(corpus):
    ds = CoviarDataset(None, None, None, "mv", num_segments=2, is_train=False,
                       items=corpus)
    a, la, _ = ds[1]
    b, lb, _ = ds[1]
    np.testing.assert_array_equal(a, b)
    assert la == lb == 1


def test_corrupt_video_zero_fills(corpus, tmp_path, capsys):
    """Decode failures zero-fill instead of killing the epoch (reference
    dataset.py:191-193), and the warning is logged once per video."""
    bad = tmp_path / "corrupt.avi"
    bad.write_bytes(b"\x00\x01garbage-not-mpeg4" * 64)
    items = list(corpus) + [corpus[0].__class__(str(bad), 1, T, None)]
    ds = CoviarDataset(None, None, None, "mv", num_segments=2,
                       is_train=False, items=items)
    frames, label, size = ds[len(items) - 1]
    assert frames.shape == (2, 256, 256, 7)  # reference fallback shape
    # mv/residual channels are the +128-encoded zeros; flow pads at 128
    assert (frames[..., 2:] == 128).all()
    assert label == 1
    ds[len(items) - 1]  # second access: no duplicate log
    out = capsys.readouterr().out
    assert out.count("zero-filling") == 1


def test_host_memory_bounded(tmp_path):
    """Reader handles and decoded-GOP bytes stay bounded while streaming
    many distinct videos (VERDICT r1 item 2: the reference frees per call,
    coviar_data_loader.c:235,387)."""
    from dmcnet_tpu.data.lists import VideoItem

    n_vids, t, h, w = 40, 12, 64, 64
    rng = np.random.default_rng(0)
    items = []
    for v in range(n_vids):
        path = tmp_path / f"m{v}.avi"
        frames = (rng.integers(0, 256, size=(t, h, w, 3)) // 8 * 8).astype(
            np.uint8)
        encode_mpeg4(path, frames, gop_size=12, bit_rate=500_000)
        items.append(VideoItem(str(path), 0, t, None))
    ds = CoviarDataset(None, None, None, "mv", num_segments=1,
                       is_train=False, items=items)
    ds._gops._max_bytes = 1 << 20  # 1 MB budget to force eviction
    for i in range(n_vids):
        ds[i]
    assert len(ds._readers) <= 32
    assert ds._gops.nbytes <= 1 << 20
    # evicted entries re-decode correctly
    a, _, _ = ds[0]
    b, _, _ = ds[0]
    np.testing.assert_array_equal(a, b)


def test_flow_ds_factor(corpus):
    ds = CoviarDataset(None, None, None, "mv", num_segments=1, is_train=True,
                       flow_ds_factor=16, items=corpus)
    asm = BatchAssembler(ds, input_size=64, scale_size=74)
    batch = asm.train_batch([0])
    parts = augment_train_batch(batch, "mv", flow_ds_factor=16, input_size=64)
    flow = np.asarray(parts["flow"])[0, 0, :, :, 0]
    # Blocky: constant within each 16x16 block.
    blk = flow[:16, :16]
    assert np.allclose(blk, blk[0, 0])


def test_prefetch_loader_ordered_by_default():
    """ordered=True (default): index-order yields regardless of worker
    completion order, so per-step train logs reproduce across any
    --workers value; ordered=False still yields every batch exactly once."""
    import time

    from dmcnet_tpu.data.loader import PrefetchLoader

    def slow_first(i):
        time.sleep(0.2 if i == 0 else 0.0)
        return i

    got = list(PrefetchLoader(slow_first, 8, workers=4))
    assert got == list(range(8)), got

    unordered = list(PrefetchLoader(slow_first, 8, workers=4,
                                    ordered=False))
    assert sorted(unordered) == list(range(8))

    # errors surface in the consumer in both modes
    def boom(i):
        if i == 3:
            raise RuntimeError("bad batch")
        return i

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="bad batch"):
        list(PrefetchLoader(boom, 8, workers=4))
