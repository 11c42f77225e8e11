#!/bin/bash
# UCF-101 dmcnet config — mirrors /root/reference/exp_my/ucf101_gen_flow/split1/run.sh
# (lr-steps 20/35/45, batch 45, epochs 50, epoch-thre 1, init from the
# coviar flow-stream model) with this framework's flag-compatible CLIs.
DATA_ROOT=${DATA_ROOT:-/data/ucf101/mpeg4}
FLOW_ROOT=${FLOW_ROOT:-/data/ucf101/tvl1}
LISTS=${LISTS:-/data/ucf101/lists}

python -m dmcnet_tpu.cli.train \
  --data-name ucf101 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --num_segments 3 \
  --no-accumulation --mv_minmaxnorm 1 --flow_ds_factor 16 \
  --gen_flow_or_delta 1 --use_databn 0 \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --train-list "$LISTS/ucf101_split1_train.txt" \
  --test-list "$LISTS/ucf101_split1_test.txt" \
  --weights flow_model_best.pth.tar \
  --lr 0.01 --lr-mse 10 --lr_mse_mult 1 --lr-steps 20 35 45 \
  --epochs 50 --epoch-thre 1 --batch-size 45 \
  --model-prefix model | tee train.log

python -m dmcnet_tpu.cli.test \
  --data-name ucf101 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --test-crops 1 --test_segments 25 \
  --no-accumulation --mv_minmaxnorm 1 --flow_ds_factor 16 \
  --gen_flow_or_delta 1 --use_databn 0 \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --test-list "$LISTS/ucf101_split1_test.txt" \
  --weights model_mv_model_best.pth.tar \
  --save-scores mv_score_model_best | tee test.log
