#!/bin/bash
# TPU-native extras on top of the reference recipe: data-parallel mesh over
# all local chips (automatic), bf16 mixed precision, Mixed-block remat for
# long clips, orbax sharding-aware checkpoints.
python -m dmcnet_tpu.cli.train_hmdb51 \
  --task-name hmdb_1_bf16 --split 1 --network I3D --clip-length 64 \
  --iter-size 8 --batch-size 16 --optimizer adam \
  --modality flow+mp4 --lr-base 0.0004 --lr-base2 0.0004 --detach 1 \
  --dataset HMDB51 --drop-out 0.85 --arch-estimator DenseNetTiny \
  --epoch-thre 6 --ds_factor 16 --mv-minmaxnorm 1 --accumulate 0 \
  --bf16 1 --remat 1 --ckpt-backend orbax \
  --data-root ./dataset/HMDB51 \
  --video-prefix /data/hmdb51/mpeg4 --flow-prefix /data/hmdb51/tvl1
