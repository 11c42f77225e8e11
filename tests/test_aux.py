"""Auxiliary subsystems: schedulers, callbacks, color, viz, initializer,
sampling."""

import numpy as np

from dmcnet_tpu.data import color
from dmcnet_tpu.data.sampling import (
    RandomSampling,
    SequentialSampling,
    get_gop_pos,
    get_gop_pos_i3d,
    get_seg_range,
)
from dmcnet_tpu.data.sampling import test_frame_index as _test_frame_index
from dmcnet_tpu.models.initializer import (
    inflate_2d_kernel,
    xavier_init_tree,
)
from dmcnet_tpu.train.callback import CallbackList, MetricPrinter, SpeedMonitor
from dmcnet_tpu.train.lr_scheduler import MultiFactorScheduler
from dmcnet_tpu.train.metrics import Accuracy, Loss, MetricList
from dmcnet_tpu.utils.viz import make_colorwheel, viz_flow


def test_multifactor_scheduler_trace():
    """Reference self-test trace (lr_scheduler.py:64-80): base 0.1,
    steps [2, 14, 18], start counter 2 — first updates decay immediately,
    then the <100-step half-lr kicks in."""
    s = MultiFactorScheduler(steps=[2, 14, 18], base_lr=0.1, factor=0.1,
                             step_counter=2)
    lrs = [s.update() for _ in range(8)]
    # counter 3..10: step 2 passed at counter 3 -> lr=0.01, halved (<100).
    assert np.allclose(lrs, [0.005] * 8)
    for _ in range(4):
        s.update()  # counters 11..14
    assert np.isclose(s.update(), 0.0005)  # counter 15 > 14 -> 0.001, halved


def test_scheduler_after_warmup():
    s = MultiFactorScheduler(steps=[1000], base_lr=0.1, factor=0.1)
    for _ in range(99):
        assert s.update() == 0.05  # halved during warmup
    assert s.update() == 0.1  # step_counter 100 -> full lr


def test_gop_pos_flavours():
    assert get_gop_pos(24, "mv") == (1, 11)   # pos 0 -> previous GOP last
    assert get_gop_pos_i3d(24, "mv") == (2, 1)  # pos 0 -> pos 1
    assert get_gop_pos(24, "iframe") == (2, 0)
    assert get_gop_pos(30, "mv") == (2, 6)


def test_seg_range_excludes_iframe():
    begin, end = get_seg_range(100, 3, 0, "mv")
    assert begin >= 1
    b2, e2 = get_seg_range(100, 3, 0, "iframe")
    assert b2 == 0


def test_test_frame_index_centres():
    g, p = _test_frame_index(120, 25, 12, "mv")
    assert 0 <= g and 0 <= p < 12


def test_samplers():
    rs = RandomSampling(num=8, interval=2, seed=0)
    idxs = rs.sampling(100)
    assert len(idxs) == 8 and all(0 <= i < 100 for i in idxs)
    idxs_short = rs.sampling(3)  # clip longer than video
    assert len(idxs_short) == 8 and max(idxs_short) <= 2

    ss = SequentialSampling(num=4, interval=1, fix_cursor=False)
    a = ss.sampling(40, v_id=0)
    b = ss.sampling(40, v_id=0)
    assert a != b  # cursor advanced


def test_callbacks():
    cb = CallbackList(SpeedMonitor(), MetricPrinter())
    msg = cb(epoch=1, batch=5, silent=True, sample_elapse=2.0,
             sample_inst=100, namevals=[("loss", 0.5)])
    assert "Epoch[1]" in msg and "50.00 samples/sec" in msg \
        and "loss = 0.50000" in msg


def test_metric_list():
    ml = MetricList(Accuracy("top1", 1), Loss("ce", 0))
    preds = np.array([[0.9, 0.1], [0.2, 0.8]])
    ml.update(preds, np.array([0, 0]), [np.array([0.3])])
    vals = dict(ml.get())
    assert vals["top1"] == 0.5
    assert np.isclose(vals["ce"], 0.3)


def test_hls_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    back = color.hls_to_bgr(color.bgr_to_hls(img))
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 2.0


def test_color_aug_bounds():
    rng = np.random.default_rng(0)
    img = np.full((8, 8, 3), 128, np.uint8)
    out = color.color_aug(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_viz_flow():
    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    u = np.linspace(-5, 5, 32)[None].repeat(32, 0)
    img = viz_flow(u, u.T)
    assert img.shape == (32, 32, 3)
    assert 0 <= img.min() and img.max() <= 1


def test_inflation():
    w2d = np.ones((3, 3, 4, 8), np.float32)
    w3d = inflate_2d_kernel(w2d, 5, "inflation")
    assert w3d.shape == (5, 3, 3, 4, 8)
    np.testing.assert_allclose(w3d.sum(0), w2d)  # mean-preserving
    w3d_r = inflate_2d_kernel(w2d, 5, "random", rng=0)
    assert (np.abs(w3d_r).sum(axis=(1, 2, 3, 4)) > 0).sum() == 1


def test_xavier():
    tree = {"a": {"kernel": np.zeros((3, 3, 4, 8), np.float32),
                  "bias": np.ones((8,), np.float32)}}
    out = xavier_init_tree(tree, rng=0)
    assert out["a"]["kernel"].std() > 0
    assert (out["a"]["bias"] == 0).all()
