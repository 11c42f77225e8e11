"""Dataset factory for the I3D variant.

Equivalent of /root/reference/code/dmcnet_I3D/data/iterator_factory.py
(get_hmdb51 :16-95, get_ucf101 :97-179, creat :184-202) without the
hardcoded cluster paths: list files live under
`<data_root>/raw/list_cvt/<name>_split<k>_{train,test}.txt` (reference
layout), video/flow locations are explicit arguments.
"""

from __future__ import annotations

import os

from dmcnet_tpu.data.lists import VideoItem, load_i3d_list
from dmcnet_tpu.data.sampling import RandomSampling, SequentialSampling
from dmcnet_tpu.data.video_iter import VideoClipDataset

_NUM_CLASSES = {"ucf101": 101, "hmdb51": 51}


def dataset_num_classes(name):
    """reference dataset/config.py:9-23."""
    key = name.lower()
    if key not in _NUM_CLASSES:
        raise ValueError(f"unknown dataset {name!r}")
    return _NUM_CLASSES[key]


def _items_from_list(list_path, video_prefix, flow_prefix, num_frames_fn):
    items = []
    for _vid, label, subpath in load_i3d_list(list_path):
        stem = os.path.splitext(subpath)[0]
        video_path = os.path.join(video_prefix, stem + ".mp4")
        flow_path = (os.path.join(flow_prefix, stem)
                     if flow_prefix else None)
        try:
            n = num_frames_fn(video_path)
        except Exception:
            continue  # reference tolerates missing videos via retry logic
        items.append(VideoItem(video_path, label, n, flow_path))
    return items


def creat(name, data_root, video_prefix, flow_prefix=None, split=1,
          clip_length=16, train_interval=2, val_interval=2,
          modality="flow+mp4", accumulate=True, ds_factor=16,
          mv_minmaxnorm=False, seed=0, num_frames_fn=None):
    """Build (train_ds, val_ds) VideoClipDatasets (reference creat :184-202)."""
    if num_frames_fn is None:
        from dmcnet_tpu.codec.coviar_compat import get_num_frames
        num_frames_fn = get_num_frames
    key = name.lower()
    lists = os.path.join(data_root, "raw", "list_cvt")
    train_list = os.path.join(lists, f"{key}_split{split}_train.txt")
    test_list = os.path.join(lists, f"{key}_split{split}_test.txt")

    train_items = _items_from_list(train_list, video_prefix, flow_prefix,
                                   num_frames_fn)
    val_items = _items_from_list(test_list, video_prefix, flow_prefix,
                                 num_frames_fn)
    train = VideoClipDataset(
        train_items,
        RandomSampling(num=clip_length, interval=train_interval,
                       speed=[1.0, 1.0], seed=seed),
        modality=modality, accumulate=accumulate,
        mv_minmaxnorm=mv_minmaxnorm, seed=seed + 2)
    val = VideoClipDataset(
        val_items,
        SequentialSampling(num=clip_length, interval=val_interval,
                           fix_cursor=True, shuffle=True, seed=seed),
        modality=modality, accumulate=accumulate,
        mv_minmaxnorm=mv_minmaxnorm, seed=seed + 3)
    return train, val
