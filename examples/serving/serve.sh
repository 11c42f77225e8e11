#!/bin/bash
# Batch-serve a test split with the TPU-resident pipeline, then fuse with
# the CoViAR modality scores exactly like run_combine.sh. No reference
# analogue: inference there = test.py (torch DataLoader, per-frame coviar
# C calls) + combine.py across three processes.
#
#   serve.sh <checkpoint> <test-list> <data-root> [mesh-devices]
set -e -o pipefail
CKPT=$1
LIST=$2
ROOT=$3
MESH=${4:-0}

python -m dmcnet_tpu.cli.serve \
  --weights "$CKPT" --data-name hmdb51 \
  --test-list "$LIST" --data-root "$ROOT" \
  --frames-per-gop 3 --backend auto --chunk-gops 64 \
  --mesh-devices "$MESH" \
  --save-scores dmc_scores.npz | tee serve.log

# 4-modality late fusion (weights 2/1/1/1, reference combine.py:24-31):
# python -m dmcnet_tpu.cli.combine \
#   --iframe iframe.npz --mv mv.npz --res residual.npz --flow dmc_scores.npz
