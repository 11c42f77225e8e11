"""dmcnet_tpu — a TPU-native (JAX/XLA/Pallas) compressed-video action-recognition
framework with the capabilities of facebookresearch/dmc-net.

Layers (bottom-up):
  codec/    — MPEG-4 front-end: native C++ demux/decode (FFmpeg libav*) emitting
              per-GOP frames + dense motion-vector maps; device-side fused
              accumulation (back-tracing) kernels replacing the reference's
              per-frame CPU C loops (reference: code/dmcnet/data_loader/coviar_data_loader.c).
  data/     — list parsing, TSN segment / clip sampling, on-device group
              transforms and normalization (reference: code/dmcnet/dataset.py,
              transforms.py; code/dmcnet_I3D/data/*).
  models/   — flax generators, discriminators, ResNet-18 TSN, I3D
              (reference: code/dmcnet{,_GAN}/model.py, code/dmcnet_I3D/network/i3d.py).
  ops/      — Pallas/XLA kernels for the hot paths.
  train/    — jitted train/eval engines, optimizers with per-group lr/decay
              multipliers, schedules, metrics, checkpointing
              (reference: code/dmcnet{,_GAN}/train.py, code/dmcnet_I3D/train/*).
  parallel/ — device mesh + sharding for data-parallel (and beyond) execution.
  cli/      — flag-compatible train/test/combine entry points
              (reference: code/dmcnet/train_options.py, test.py, combine.py).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DMCNET_JAX_PLATFORM"):
    # Dedicated escape hatch for SUBPROCESS drivers (e.g. the parity
    # harness, examples/parity/run.sh, spawning `python -m
    # dmcnet_tpu.cli.test` on CPU): the axon TPU wrapper pins
    # JAX_PLATFORMS=axon at interpreter start and a plain env override is
    # ignored, so the platform must be re-asserted through jax.config
    # BEFORE backend init.  A dedicated variable (not JAX_PLATFORMS) so
    # in-process test runs, whose conftest already selected a platform,
    # are never re-pinned by importing this package.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["DMCNET_JAX_PLATFORM"])
    except Exception:  # backend already initialized — leave it be
        pass
