#!/bin/bash
# Late fusion — mirrors exp_my/hmdb51_gan/split1/run_combine.sh.
python -m dmcnet_tpu.cli.combine \
  --iframe "$1" --mv "$2" --res "$3" --flow mv_score_model_best.npz | tee acc.log
