"""Device transform parity vs numpy/scipy references."""

import numpy as np
import pytest
from scipy import interpolate

from dmcnet_tpu.data import transforms as T


def _ref_bilinear_resize(img, out_h, out_w):
    """cv2-style (half-pixel, no antialias) bilinear resize, float."""
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w) + img.shape[2:], np.float64)
    for i in range(out_h):
        sy = np.clip((i + 0.5) * h / out_h - 0.5, 0, h - 1)
        y0 = int(np.floor(sy)); y1 = min(y0 + 1, h - 1); wy = sy - y0
        for j in range(out_w):
            sx = np.clip((j + 0.5) * w / out_w - 0.5, 0, w - 1)
            x0 = int(np.floor(sx)); x1 = min(x0 + 1, w - 1); wx = sx - x0
            out[i, j] = ((1 - wy) * (1 - wx) * img[y0, x0]
                         + (1 - wy) * wx * img[y0, x1]
                         + wy * (1 - wx) * img[y1, x0]
                         + wy * wx * img[y1, x1])
    return out


def test_apply_crops_matches_crop_then_resize(rng):
    frames = rng.random((1, 2, 40, 56, 7)).astype(np.float32) * 255
    oh, ow, ch, cw = 5, 9, 30, 40
    sh, sw, th, tw = T.crop_spec_to_scale_translate(oh, ow, ch, cw, 16)
    out = T.apply_crops(frames, np.array([[sh, sw]], np.float32),
                        np.array([[th, tw]], np.float32),
                        np.array([False]), out_size=16)
    ref = _ref_bilinear_resize(frames[0, 0, oh:oh + ch, ow:ow + cw], 16, 16)
    np.testing.assert_allclose(np.asarray(out)[0, 0], ref, atol=1e-3)


def test_apply_crops_flip_negates_x_channels(rng):
    frames = rng.random((1, 1, 32, 32, 7)).astype(np.float32) * 255
    sh, sw, th, tw = T.crop_spec_to_scale_translate(0, 0, 32, 32, 32)
    spec = (np.array([[sh, sw]], np.float32), np.array([[th, tw]], np.float32))
    out = T.apply_crops(frames, *spec, np.array([False]), out_size=32)
    out_f = T.apply_crops(frames, *spec, np.array([True]), out_size=32)
    base = np.asarray(out)[0, 0]
    flip = np.asarray(out_f)[0, 0]
    mirrored = base[:, ::-1]
    np.testing.assert_allclose(flip[..., 0], 256 - mirrored[..., 0], atol=1e-3)
    np.testing.assert_allclose(flip[..., 1], mirrored[..., 1], atol=1e-3)
    np.testing.assert_allclose(flip[..., 2], 256 - mirrored[..., 2], atol=1e-3)
    np.testing.assert_allclose(flip[..., 4:], mirrored[..., 4:], atol=1e-3)


def test_apply_crops_vertical_flip(rng):
    """RandomVerticalFlip parity (reference image_transforms.py:202-212):
    plain flipud, NO channel negation; composes with the mirror flip."""
    frames = rng.random((2, 1, 32, 32, 7)).astype(np.float32) * 255
    sh, sw, th, tw = T.crop_spec_to_scale_translate(0, 0, 32, 32, 32)
    spec = (np.tile([[sh, sw]], (2, 1)).astype(np.float32),
            np.tile([[th, tw]], (2, 1)).astype(np.float32))
    base = np.asarray(T.apply_crops(frames, *spec,
                                    np.array([False, True]), out_size=32))
    out = np.asarray(T.apply_crops(frames, *spec, np.array([False, True]),
                                   out_size=32,
                                   vflips=np.array([True, True])))
    np.testing.assert_allclose(out, base[:, :, ::-1], atol=1e-5)


def test_center_crop_spec_matches_resize_then_crop(rng):
    img = rng.random((48, 64, 7)).astype(np.float32) * 255
    sh, sw, th, tw = T.center_crop_spec(48, 64, 32, 28)
    out = T.apply_crops(img[None, None], np.array([[sh, sw]], np.float32),
                        np.array([[th, tw]], np.float32),
                        np.array([False]), out_size=28)
    resized = _ref_bilinear_resize(img, 32, 32)
    ref = resized[2:30, 2:30]
    np.testing.assert_allclose(np.asarray(out)[0, 0], ref, atol=1e-3)


def test_blockify_repeat_matches_block_reduce(rng):
    flow = rng.random((1, 2, 16, 16, 2)).astype(np.float32)
    out = np.asarray(T.blockify_flow(flow, 4, upsample_interp=False))
    blocks = flow.reshape(1, 2, 4, 4, 4, 4, 2).mean(axis=(3, 5))
    ref = np.repeat(np.repeat(blocks, 4, axis=2), 4, axis=3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_blockify_interp_matches_scipy(rng):
    flow = rng.random((1, 1, 16, 16, 2)).astype(np.float32)
    factor = 4
    out = np.asarray(T.blockify_flow(flow, factor, upsample_interp=True))
    blocks = flow.reshape(1, 1, 4, 4, 4, 4, 2).mean(axis=(3, 5))
    n = blocks.shape[2]
    f = interpolate.interp1d(np.linspace(0, 1, n), blocks, kind="linear",
                             axis=2)
    up = f(np.linspace(0, 1, n * factor))
    f = interpolate.interp1d(np.linspace(0, 1, n), up, kind="linear", axis=3)
    ref = f(np.linspace(0, 1, n * factor))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_normalize_group_values():
    frames = np.full((1, 1, 8, 8, 7), 128.0, np.float32)
    parts = T.normalize_group(frames, "mv")
    x = 128.0 / 255.0
    np.testing.assert_allclose(np.asarray(parts["flow"]),
                               (x - 0.5) / T.MEAN_STD, atol=1e-5)
    np.testing.assert_allclose(np.asarray(parts["mv"]),
                               (x - 0.5) / T.MEAN_STD, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(parts["residual"])[0, 0, 0, 0],
        (x - 0.5) / T.IMAGENET_STD, atol=1e-5)


def test_multiscale_crop_sampler_bounds(rng):
    for _ in range(50):
        oh, ow, ch, cw = T.sample_multiscale_crop(rng, 256, 340, 224)
        assert 0 <= oh <= 256 - ch
        assert 0 <= ow <= 340 - cw
        assert ch in (224, 192, 224 * 1, int(256 * .875), int(256 * .75), 256)


def test_oversample_specs_count():
    specs = T.oversample_specs(256, 340, 256, 224)
    assert len(specs) == 10
    flips = [s[4] for s in specs]
    assert flips == [False, True] * 5
