"""Compressed-video codec layer.

The reference implements this layer as a 636-line CPython C extension
(`code/dmcnet/data_loader/coviar_data_loader.c`) that re-parses the whole video
file from byte 0 for every sampled frame and runs O(W*H*GOP) accumulation loops
on the host. Here the layer is split TPU-first:

  * native/   — C++ (FFmpeg libav*) demux + decode, run ONCE per GOP, emitting
                decoded BGR frames and dense per-frame motion-vector maps.
  * semantics — pure-NumPy golden model of the reference's accumulation
                semantics (block back-tracing, residual reconstruction) used
                for bit-parity tests.
  * accumulate— the production path: fused JAX/XLA (and Pallas) kernels that
                back-trace motion and compute residuals for EVERY frame of a
                batch of GOPs in a single `lax.scan`, on device.
"""

from dmcnet_tpu.codec.semantics import (
    MVBlock,
    rasterize_blocks,
    accumulate_gop_numpy,
    load_like_coviar_numpy,
)
from dmcnet_tpu.codec.accumulate import (
    backtrace_gop,
    accumulated_mv_from_src,
    accumulated_residual_from_src,
    gop_mv_residual,
    load_like_coviar_jax,
)
