#!/bin/bash
# UCF-101 GAN variant — mirrors /root/reference/exp_my/ucf101_gan/split1/run.sh
# (Discriminator3, lr-adv-d 0.01, flow_ds_factor 0, epoch-thre 0, batch 30,
# init from the ucf101_gen_flow best model).
DATA_ROOT=${DATA_ROOT:-/data/ucf101/mpeg4}
FLOW_ROOT=${FLOW_ROOT:-/data/ucf101/tvl1}
LISTS=${LISTS:-/data/ucf101/lists}

python -m dmcnet_tpu.cli.train_gan \
  --data-name ucf101 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --arch_d Discriminator3 \
  --num_segments 3 --no-accumulation --mv_minmaxnorm 1 \
  --flow_ds_factor 0 --gen_flow_or_delta 1 --use_databn 0 \
  --weights ../ucf101_gen_flow/model_mv_model_best.pth.tar \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --train-list "$LISTS/ucf101_split1_train.txt" \
  --test-list "$LISTS/ucf101_split1_test.txt" \
  --lr 0.01 --lr-adv-g 1 --lr-adv-d 0.01 --lr-mse 10 --lr_mse_mult 1 \
  --lr_d_mult 1 --lr-steps 20 35 45 --epochs 50 --epoch-thre 0 \
  --batch-size 30 --model-prefix gan | tee train.log

python -m dmcnet_tpu.cli.test \
  --data-name ucf101 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --test-crops 1 --test_segments 25 \
  --no-accumulation --mv_minmaxnorm 1 --flow_ds_factor 0 \
  --gen_flow_or_delta 1 --use_databn 0 \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --test-list "$LISTS/ucf101_split1_test.txt" \
  --weights gan_mv_model_best.pth.tar \
  --save-scores mv_score_model_best | tee test.log
