#!/bin/bash
# Late fusion — mirrors exp_my/ucf101_gen_flow/split1/run_combine.sh
# ($1/$2/$3 = the three coviar-stream score files).
python -m dmcnet_tpu.cli.combine \
  --iframe "$1" --mv "$2" --res "$3" --flow mv_score_model_best.npz | tee acc.log
