"""I3D clip dataset — the VideoIter equivalent.

Mirrors /root/reference/code/dmcnet_I3D/data/video_iterator.py:312-579:

  * temporal sampling via Random/SequentialSampling over the video's frame
    count;
  * per-frame modality assembly (mploader, :91-178): mv = accumulated MV
    (+ optional min-max norm) +128 clipped to uint8; res = accumulated
    residual +128; I = GOP I-frame BGR->RGB; rgb = decoded frame;
    flow+mp4 = [flow(2), mv(2), res(3)] 7-channel stack;
  * I3D GOP-position remap: position 0 -> position 1 (video_iterator.py:80-89);
  * fault tolerance: up to `max_retries` resampling trials on bad frames,
    then a known-good backup item; exceptions -> random re-index
    (:373-426, :442-454);
  * cached per-video frame-count info files with header validation
    (:479-577).

TPU-first split: this class only assembles raw uint8 clips on the host
(GOP decode + accumulate once, cached); crop/flip/normalize/blockify run on
device (see `i3d_batch` below and data/transforms.py).
"""

from __future__ import annotations

import json
import os
import threading

import numpy as np

from dmcnet_tpu.codec.host_accumulate import gop_mv_residual_numpy
from dmcnet_tpu.codec.mpeg4 import shared_reader_cache
from dmcnet_tpu.data import transforms as T
from dmcnet_tpu.data.dmc_dataset import GopCache
from dmcnet_tpu.data.sampling import SequentialSampling, get_gop_pos_i3d

_CHANNELS = {"rgb": 3, "I": 3, "res": 3, "mv": 2, "flow": 2, "flow+mp4": 7}


class VideoClipDataset:
    """Index-addressable clip dataset: `ds[i]` -> (clip (T,H,W,C) uint8,
    label)."""

    def __init__(self, items, sampler, modality="flow+mp4", accumulate=True,
                 mv_minmaxnorm=False, gop=12, max_retries=20, seed=0,
                 cached_info_path=None, shuffle_list_seed=None):
        self.items = list(items)
        self.sampler = sampler
        self.modality = modality
        self.accumulate = accumulate
        self.mv_minmaxnorm = mv_minmaxnorm
        self.gop = gop
        self.max_retries = max_retries
        self.rng = np.random.default_rng(seed)
        self._readers = shared_reader_cache(32)
        self._gops = GopCache()
        self._sampler_lock = threading.Lock()
        self._backup_item = None
        if shuffle_list_seed is not None:
            np.random.default_rng(shuffle_list_seed).shuffle(self.items)
        if cached_info_path:
            self._apply_cached_info(cached_info_path)

    # -- frame-count info cache (reference :479-577) ----------------------

    def _apply_cached_info(self, path):
        key = json.dumps([it.path for it in self.items[:4]])
        if os.path.exists(path):
            with open(path) as f:
                payload = json.load(f)
            if payload.get("check") == key:
                counts = payload["counts"]
                self.items = [it.__class__(it.path, it.label,
                                           counts.get(it.path, it.num_frames),
                                           it.flow_path)
                              for it in self.items]
                return
        counts = {it.path: it.num_frames for it in self.items}
        with open(path, "w") as f:
            json.dump({"check": key, "counts": counts}, f)

    # -- decoding ---------------------------------------------------------

    def __len__(self):
        return len(self.items)

    def _reader(self, path):
        return self._readers.get(path)

    def _frame(self, item, frame_idx):
        """One (H, W, C) uint8 frame in the requested modality."""
        gop_index, gop_pos = get_gop_pos_i3d(frame_idx, self.modality,
                                             self.gop)
        reader = self._reader(item.path)
        gop_index = max(0, min(gop_index, reader.num_gops - 1))
        bound = 20 if self.mv_minmaxnorm else None
        # rgb/I/flow never touch motion vectors: skip MV rasterization +
        # accumulation (also the only valid mode for non-MPEG4 originals,
        # e.g. H.264 — matching the reference's codec-generic cv2 rgb
        # reader, code/dmcnet_I3D/data/video_iterator.py:185-309).  'flow'
        # reads external JPEGs and uses frames only for their shape.
        frames_only = self.modality in ("rgb", "I", "flow")
        frames, mv_enc, res_enc = self._gops.get(
            reader, item.path, gop_index, self.accumulate, bound,
            frames_only=frames_only)
        gop_pos = min(gop_pos, len(frames) - 1)

        def mv_u8():
            return mv_enc[gop_pos]

        def res_u8():
            return res_enc[gop_pos]

        def flow_u8():
            if item.flow_path is None:
                return np.full(frames.shape[1:3] + (2,), 128, np.uint8)
            from PIL import Image
            idx = frame_idx + 1
            x = np.array(Image.open(os.path.join(
                item.flow_path, f"flow_x_{idx:05d}.jpg")).convert("L"))
            y = np.array(Image.open(os.path.join(
                item.flow_path, f"flow_y_{idx:05d}.jpg")).convert("L"))
            return np.stack([x, y], axis=-1)

        if self.modality == "rgb":
            return frames[gop_pos][..., ::-1]
        if self.modality == "I":
            return frames[0][..., ::-1]
        if self.modality == "mv":
            return mv_u8()
        if self.modality == "res":
            return res_u8()
        if self.modality == "flow":
            return flow_u8()
        assert self.modality == "flow+mp4"
        return np.concatenate([flow_u8(), mv_u8(), res_u8()], axis=-1)

    def _get_clip(self, index):
        item = self.items[index % len(self.items)]
        range_max = max(item.num_frames, 1)
        # samplers keep internal RNG/cursor state: serialize the (cheap)
        # draw so PrefetchLoader threads can decode concurrently
        with self._sampler_lock:
            if isinstance(self.sampler, SequentialSampling):
                idxs = self.sampler.sampling(range_max, v_id=index)
            else:
                idxs = self.sampler.sampling(range_max)
        clip = np.stack([self._frame(item, int(i)) for i in idxs])
        return clip, item.label

    def __getitem__(self, index):
        for trial in range(self.max_retries):
            try:
                clip, label = self._get_clip(index)
                self._backup_item = (clip, label)
                return clip, label
            except Exception:
                with self._sampler_lock:
                    index = int(self.rng.integers(len(self.items)))
        if self._backup_item is not None:
            return self._backup_item
        raise RuntimeError(f"failed to load any clip after "
                           f"{self.max_retries} retries")


class I3DBatchAssembler:
    """Collate clips into device-ready canvases + crop specs.

    Train: RandomCrop(224) + coin-flip mirror (iterator_factory.py:49-56);
    eval: CenterCrop(224) (no rescale, :75-79).
    """

    def __init__(self, dataset, input_size=224, is_train=True, seed=0,
                 pad_hw=None, hls_vars=(15, 35, 25), vertical_flip=False):
        self.ds = dataset
        self.input_size = input_size
        self.is_train = is_train
        # optional RandomVerticalFlip (reference image_transforms.py:202-212;
        # offered by its transform surface, unused by the shipped recipes)
        self.vertical_flip = vertical_flip
        self.rng = np.random.default_rng(seed + 7)
        self._rng_lock = threading.Lock()
        self.pad_hw = pad_hw
        self.hls_vars = hls_vars
        # rgb/I train pipelines add RandomScale + RandomHLS
        # (iterator_factory.py:38-46); scale folds into the crop spec, HLS
        # jitter runs on host per clip.
        self.rgb_aug = dataset.modality in ("rgb", "I") and is_train
        self.negate_channels = {"flow+mp4": (0, 2), "mv": (0,),
                                "flow": (0,)}.get(dataset.modality, ())

    def batch(self, indices):
        # numpy Generators are not thread-safe: each call works from a child
        # generator forked under the lock (loader threads call concurrently)
        with self._rng_lock:
            rng = np.random.default_rng(self.rng.integers(2 ** 63))
        clips, labels = zip(*(self.ds[i] for i in indices))
        sizes = [c.shape[1:3] for c in clips]
        hp = self.pad_hw[0] if self.pad_hw else max(
            max(s[0] for s in sizes), self.input_size)
        wp = self.pad_hw[1] if self.pad_hw else max(
            max(s[1] for s in sizes), self.input_size)
        ch = clips[0].shape[-1]
        frames = np.zeros((len(clips), clips[0].shape[0], hp, wp, ch),
                          np.uint8)
        scales, trans, flips, vflips = [], [], [], []
        cs = self.input_size
        for i, (clip, (h, w)) in enumerate(zip(clips, sizes)):
            if self.rgb_aug:
                from dmcnet_tpu.data.color import random_hls
                clip = np.stack([random_hls(f, rng, self.hls_vars)
                                 for f in clip])
            frames[i, :, :h, :w] = clip
            crop_h = crop_w = cs
            if self.is_train:
                if self.rgb_aug:
                    # RandomScale(slen 224..288, aspect 0.8..1.25) expressed
                    # as a larger/smaller source crop resized to input_size.
                    hi = max(float(cs), min(cs * 288 / 224, min(h, w)))
                    slen = rng.uniform(cs, hi)
                    aspect = rng.uniform(0.8, 1.25)
                    crop_h = int(min(h, slen))
                    crop_w = int(min(w, slen * aspect))
                oh = int(rng.integers(0, max(h - crop_h, 0) + 1))
                ow = int(rng.integers(0, max(w - crop_w, 0) + 1))
                flip = bool(rng.random() < 0.5)
            else:
                oh, ow = max((h - cs) // 2, 0), max((w - cs) // 2, 0)
                flip = False
            sh, sw, th, tw = T.crop_spec_to_scale_translate(
                oh, ow, crop_h, crop_w, cs)
            scales.append((sh, sw))
            trans.append((th, tw))
            flips.append(flip)
            vflips.append(bool(self.vertical_flip and self.is_train
                               and rng.random() < 0.5))
        return {
            "frames": frames,
            "scales": np.asarray(scales, np.float32),
            "translations": np.asarray(trans, np.float32),
            "flips": np.asarray(flips, bool),
            "vflips": np.asarray(vflips, bool),
            "label": np.asarray(labels, np.int32),
        }


def i3d_augment_batch(batch, modality="flow+mp4", ds_factor=0,
                      upsample_interp=False, input_size=224,
                      mean=0.5, std=0.5):
    """Device: crop/flip, /255, (x-mean)/std on ALL channels (the intended
    semantics of the reference Normalize — its 3-channel zip is quirk (c)
    of SURVEY.md §2.5), flow blockify for flow+mp4.

    Returns dict(mv, residual, flow, label) for flow+mp4, else dict(x, label).
    """
    import jax.numpy as jnp

    neg = {"flow+mp4": (0, 2), "mv": (0,), "flow": (0,)}.get(modality, ())
    frames = jnp.asarray(batch["frames"]).astype(jnp.float32)
    vflips = batch.get("vflips")
    out = T.apply_crops(frames, jnp.asarray(batch["scales"]),
                        jnp.asarray(batch["translations"]),
                        jnp.asarray(batch["flips"]), out_size=input_size,
                        negate_channels=neg,
                        vflips=None if vflips is None
                        else jnp.asarray(vflips))
    x = (out / 255.0 - mean) / std
    label = jnp.asarray(batch["label"])
    if modality != "flow+mp4":
        return {"x": x, "label": label}
    flow = x[..., 0:2]
    if ds_factor:
        flow = T.blockify_flow(flow, ds_factor, upsample_interp)
    return {"flow": flow, "mv": x[..., 2:4], "residual": x[..., 4:7],
            "label": label}
