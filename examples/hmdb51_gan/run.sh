#!/bin/bash
# GAN variant initialized from the no-GAN flow (exp_my/hmdb51_gan workflow).
python -m dmcnet_tpu.cli.train_gan \
  --data-name hmdb51 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --arch_d Discriminator \
  --num_segments 3 --no-accumulation --mv_minmaxnorm 1 \
  --flow_ds_factor 16 --gen_flow_or_delta 1 \
  --weights ../hmdb51_gen_flow/model_mv_model_best.pth.tar \
  --data-root "$DATA_ROOT" --flow-root "$FLOW_ROOT" \
  --train-list "$LISTS/hmdb51_split1_train.txt" \
  --test-list "$LISTS/hmdb51_split1_test.txt" \
  --lr 0.001 --lr-adv-g 1 --lr-adv-d 1 --lr_d_mult 0.01 \
  --epochs 120 --batch-size 40 --model-prefix gan | tee train.log
