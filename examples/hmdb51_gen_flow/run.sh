#!/bin/bash
# Headline dmcnet config — mirrors /root/reference/exp_my/hmdb51_gen_flow/split1/run.sh
# with this framework's flag-compatible CLIs.
DATA_ROOT=${DATA_ROOT:-/data/hmdb51/mpeg4}
FLOW_ROOT=${FLOW_ROOT:-/data/hmdb51/tvl1}
LISTS=${LISTS:-/data/hmdb51/lists}

python -m dmcnet_tpu.cli.train \
  --data-name hmdb51 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --num_segments 3 \
  --no-accumulation --mv_minmaxnorm 1 --flow_ds_factor 16 \
  --gen_flow_or_delta 1 \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --train-list "$LISTS/hmdb51_split1_train.txt" \
  --test-list "$LISTS/hmdb51_split1_test.txt" \
  --lr 0.01 --lr-mse 1 --lr-steps 55 110 165 --lr-decay 0.25 \
  --epochs 220 --batch-size 40 --model-prefix model | tee train.log

python -m dmcnet_tpu.cli.test \
  --data-name hmdb51 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --no-accumulation --mv_minmaxnorm 1 \
  --flow_ds_factor 16 --gen_flow_or_delta 1 \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --test-list "$LISTS/hmdb51_split1_test.txt" \
  --weights model_mv_model_best.pth.tar \
  --save-scores mv_score_model_best | tee test.log
