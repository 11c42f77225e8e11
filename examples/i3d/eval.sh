#!/bin/bash
# I3D whole-video evaluation — mirrors /root/reference/code/dmcnet_I3D/
# test/test.sh (evaluate_video_hmdb_i3d.py with --clip-length 250).
python -m dmcnet_tpu.cli.evaluate_video_i3d \
  --dataset HMDB51 --split 1 --clip-length 250 --frame-interval 1 \
  --modality flow+mp4 --arch-estimator DenseNetTiny \
  --mv-minmaxnorm 1 --accumulate 0 --ds_factor 16 \
  --num-sample 1 --batch-size 1 \
  --load-weights ./exps/models/hmdb_1_ep-0010.pth \
  --score-file ./exps/score/hmdb_1_eval \
  --data-root ./dataset/HMDB51 --video-prefix /data/hmdb51/mpeg4
