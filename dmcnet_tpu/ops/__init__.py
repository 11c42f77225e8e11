"""TPU-optimized ops: packed (space-to-depth) DMC generator inference."""

from dmcnet_tpu.ops.packed_generator import (
    PackedDenseEstimator,
    space_to_depth,
    depth_to_space,
)
