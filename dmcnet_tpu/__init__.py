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
