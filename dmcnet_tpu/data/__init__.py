"""Data pipeline: list parsing, temporal sampling, on-device augmentation."""

from dmcnet_tpu.data.lists import load_video_list
from dmcnet_tpu.data.sampling import (
    get_seg_range,
    get_gop_pos,
    get_gop_pos_i3d,
    train_frame_index,
    test_frame_index,
    RandomSampling,
    SequentialSampling,
)
from dmcnet_tpu.data import transforms
