"""On-device group transforms and normalization.

The reference augments on the host with cv2/numpy (code/dmcnet/transforms.py);
here every geometric transform is reduced to a per-sample "crop spec" —
(crop offset, crop size, flip) sampled on host — executed on device as ONE
fused `jax.image.scale_and_translate` gather with static output shapes, so
train/eval/10-crop pipelines are all the same jitted kernel.

Semantics preserved:
  * GroupMultiScaleCrop (transforms.py:117-191): scale set {1, .875, .75
    (, .66)}, max_distort 1, random offsets, resize to input_size, bilinear
    with cv2 half-pixel sampling;
  * GroupRandomHorizontalFlip (transforms.py:47-58): mirror + map channels
    0 and 2 (flow_x, mv_x) to 256-x (sign flip around the +128 encoding);
  * GroupScale + GroupCenterCrop (transforms.py:36-44,60-75): resize to
    (scale_size, scale_size) then centre crop — composed into one gather;
  * GroupOverSample (transforms.py:77-110): 5 fixed offsets x (identity,
    flip) = 10 crops;
  * flow blockify (dataset.py:229-246): block-mean then nearest repeat, or
    align-corners linear upsample (scipy interp1d semantics);
  * normalization (dataset.py:251-263): mv/flow (x-.5)/mean(std), residual
    (x-.5)/std, iframe ImageNet mean/std.

Channel layout of a "group frame" is [flow(2), mv(2), residual(3)] = 7,
matching dataset.py:215.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
MEAN_STD = float(IMAGENET_STD.mean())  # 0.226 (dataset.py:260-262)


# ---------------------------------------------------------------------------
# Host-side crop-spec sampling
# ---------------------------------------------------------------------------

def fill_fix_offset(more_fix_crop, image_w, image_h, crop_w, crop_h):
    """The reference's 5/13 fixed crop anchor list (transforms.py:168-191)."""
    w_step = (image_w - crop_w) // 4
    h_step = (image_h - crop_h) // 4
    ret = [(0, 0), (4 * w_step, 0), (0, 4 * h_step),
           (4 * w_step, 4 * h_step), (2 * w_step, 2 * h_step)]
    if more_fix_crop:
        ret += [(0, 2 * h_step), (4 * w_step, 2 * h_step),
                (2 * w_step, 4 * h_step), (2 * w_step, 0),
                (1 * w_step, 1 * h_step), (3 * w_step, 1 * h_step),
                (1 * w_step, 3 * h_step), (3 * w_step, 3 * h_step)]
    return ret


def sample_multiscale_crop(rng, image_h, image_w, input_size,
                           scales=(1, .875, .75), max_distort=1,
                           fix_crop=False, more_fix_crop=True):
    """One (offset_h, offset_w, crop_h, crop_w, flip=False) spec
    (reference _sample_crop_size, transforms.py:141-166).

    NOTE the reference swaps names (image_w := shape[0]); behaviour kept,
    variables named honestly here.
    """
    base_size = min(image_h, image_w)
    crop_sizes = [int(base_size * s) for s in scales]
    snap = lambda c: input_size if abs(c - input_size) < 3 else c
    crop_hs = [snap(c) for c in crop_sizes]
    crop_ws = [snap(c) for c in crop_sizes]
    pairs = [(ch, cw) for i, ch in enumerate(crop_hs)
             for j, cw in enumerate(crop_ws) if abs(i - j) <= max_distort]
    crop_h, crop_w = pairs[rng.integers(len(pairs))]
    if not fix_crop:
        offset_h = int(rng.integers(0, image_h - crop_h + 1))
        offset_w = int(rng.integers(0, image_w - crop_w + 1))
    else:
        offsets = fill_fix_offset(more_fix_crop, image_w, image_h,
                                  crop_w, crop_h)
        offset_w, offset_h = offsets[rng.integers(len(offsets))]
    return offset_h, offset_w, crop_h, crop_w


def crop_spec_to_scale_translate(offset_h, offset_w, crop_h, crop_w,
                                 out_size):
    """(scale_h, scale_w, t_h, t_w) for scale_and_translate such that the
    output equals bilinear-resize(img[oh:oh+ch, ow:ow+cw], out) with cv2
    half-pixel sampling."""
    sh = out_size / crop_h
    sw = out_size / crop_w
    return sh, sw, -offset_h * sh, -offset_w * sw


def center_crop_spec(image_h, image_w, scale_size, crop_size):
    """GroupScale(scale_size) + GroupCenterCrop(crop_size) composed: resize
    the full frame to (scale_size, scale_size) then take the centre crop —
    expressed as a single crop spec in original-image coordinates."""
    # Output pixel i samples resized coordinate i + off, i.e. original
    # coordinate ((i + off + 0.5) * H / scale_size) - 0.5.
    off = (scale_size - crop_size) // 2
    sh = scale_size / image_h
    sw = scale_size / image_w
    return sh, sw, -float(off), -float(off)


def oversample_specs(image_h, image_w, scale_size, crop_size):
    """GroupOverSample: scale to (scale_size)^2 then 5 fixed crops x
    (identity, flip) = 10 specs (transforms.py:77-110)."""
    sh = scale_size / image_h
    sw = scale_size / image_w
    # NOTE: the reference indexes arrays as img[o_w:o_w+crop_w, o_h:...] —
    # i.e. its "w" offset indexes rows.  fill_fix_offset is symmetric in its
    # current uses (square scaled images), so we use (row, col) honestly.
    specs = []
    for o_row, o_col in fill_fix_offset(False, scale_size, scale_size,
                                        crop_size, crop_size):
        for flip in (False, True):
            specs.append((sh, sw, -float(o_row), -float(o_col), flip))
    return specs


# ---------------------------------------------------------------------------
# Device-side fused kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_size", "negate_channels"))
def apply_crops(frames, scales_hw, translations_hw, flips, out_size=224,
                negate_channels=(0, 2), vflips=None):
    """Batched crop+resize+flip.

    Args:
      frames: (B, S, H, W, C) float32 group frames (encoded domain 0..255).
      scales_hw, translations_hw: (B, 2) float32 per-sample specs.
      flips: (B,) bool.
      out_size: static output spatial size.
      negate_channels: channels mapped to 256-x on mirror — (0, 2) for the
        [flow, mv, residual] layout (flow_x, mv_x); (0,) for iframe groups.
      vflips: optional (B,) bool vertical flips (reference
        RandomVerticalFlip, image_transforms.py:202-212 — a plain flipud
        with NO channel negation, faithfully; unused by the reference main
        recipes but part of its transform surface).

    Returns (B, S, out, out, C) float32.
    """
    if vflips is None:
        vflips = jnp.zeros(frames.shape[0], bool)

    def one(sample, scale, trans, flip, vflip):
        out = jax.image.scale_and_translate(
            sample, (sample.shape[0], out_size, out_size, sample.shape[-1]),
            (1, 2), scale, trans, method="linear", antialias=False)
        neg = out[:, :, ::-1, :]
        for ch in negate_channels:
            neg = neg.at[..., ch].set(256.0 - neg[..., ch])
        out = jnp.where(flip, neg, out)
        return jnp.where(vflip, out[:, ::-1, :, :], out)

    return jax.vmap(one)(frames, scales_hw, translations_hw, flips, vflips)


def _align_corners_upsample_axis(x, factor, axis):
    """scipy interp1d(linspace(0,1,n)) evaluated at linspace(0,1,n*f):
    align-corners linear upsampling (dataset.py:239-245)."""
    n_in = x.shape[axis]
    n_out = n_in * factor
    a = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    scale = 1.0 / a if a else 1.0
    # jax samples x_in = (x_out + 0.5 - t)/s - 0.5; want x_in = a * x_out.
    trans = 0.5 - 0.5 * scale
    scale_v = jnp.ones((1,)) * scale
    trans_v = jnp.ones((1,)) * trans
    shape = list(x.shape)
    shape[axis] = n_out
    return jax.image.scale_and_translate(
        x, tuple(shape), (axis,), scale_v, trans_v, method="linear",
        antialias=False)


@functools.partial(jax.jit,
                   static_argnames=("factor", "upsample_interp"))
def blockify_flow(flow, factor, upsample_interp=False):
    """Block-mean the flow then upsample back (dataset.py:229-246).

    flow: (..., H, W, 2); factor divides H and W.
    """
    if factor == 0:
        return flow
    *lead, h, w, c = flow.shape
    x = flow.reshape((-1, h, w, c))
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, factor, factor, 1), (1, factor, factor, 1),
        "VALID") / (factor * factor)
    if upsample_interp:
        x = _align_corners_upsample_axis(x, factor, 1)
        x = _align_corners_upsample_axis(x, factor, 2)
    else:
        x = jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)
    return x.reshape(tuple(lead) + (h, w, c))


@functools.partial(jax.jit, static_argnames=("representation", "flow_ds_factor",
                                             "upsample_interp"))
def normalize_group(frames, representation, flow_ds_factor=0,
                    upsample_interp=False):
    """Split a (B, S, out, out, 7) group stack into normalized model inputs.

    Returns dict(flow, mv, residual) each (B, S, out, out, C) float32
    (dataset.py:224-263).  For `representation == 'iframe'` the `mv` slot
    carries the RGB iframe instead (the reference reuses the variable).
    """
    x = frames / 255.0
    flow = (x[..., 0:2] - 0.5) / MEAN_STD
    if flow_ds_factor:
        flow = blockify_flow(flow, flow_ds_factor, upsample_interp)
    if representation == "iframe":
        mv = (x[..., 2:5] - IMAGENET_MEAN) / IMAGENET_STD
        residual = x[..., 5:]
    else:
        mv = (x[..., 2:4] - 0.5) / MEAN_STD
        residual = (x[..., 4:7] - 0.5) / IMAGENET_STD
    return {"flow": flow, "mv": mv, "residual": residual}


def clip_and_scale(img, bound=20.0):
    """MV min-max normalization: +-bound -> +-127.5 (dataset.py:40-43)."""
    return np.asarray(img, np.float64) * (127.5 / bound)
