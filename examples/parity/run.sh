#!/bin/bash
# Real-data accuracy-parity harness: prove the shipped reference numbers
# (BASELINE.md: HMDB-51 split1 fusion 64.05% GAN / 62.03% CoViAR-3mod)
# end-to-end the day real data + released checkpoints are mounted.
#
# Two modes:
#
#   1. SCORES mode (runnable against a reference checkout's exp_my/):
#        SCORES=/root/reference/exp_my ./run.sh
#      Fuses the shipped per-modality score npz artifacts with our
#      cli.combine and asserts the exact shipped accuracies — verifies the
#      fusion math + npz compatibility today, with no data needed.
#      (Reference: exp_my/hmdb51_gan/split1/run_combine.sh.)
#
#   2. FULL mode (needs the real dataset + released .pth.tar checkpoints):
#        DATA_ROOT=<mpeg4 video root> TEST_LIST=<hmdb51 split1 test list> \
#        CKPTS=<dir with {iframe,mv,residual,dmc_gan}.pth.tar> ./run.sh
#      Imports each reference checkpoint, runs the 25-segment/10-crop eval
#      protocol (cli.test, reference code/dmcnet/test.py:48,183-198) to
#      produce bit-compatible npz score files, fuses them, and asserts the
#      same numbers.
#
# Anything missing -> prints SKIP with the reason and exits 0 (CI-safe).
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
SPLIT="${SPLIT:-1}"
OUT="${OUT:-./parity_out}"
mkdir -p "$OUT"

# EXPECT_FULL parameterizes the FULL-mode assertion: the real dataset +
# released checkpoints assert the shipped 64.05; a synthetic stand-in run
# (tests/test_parity_full.py) sets EXPECT_FULL=any to assert only that the
# whole pipeline completed and a fused accuracy was computed.
EXPECT_FULL="${EXPECT_FULL:-64.05}"
# TEST_FLAGS (default empty) is appended to each cli.test call — argparse
# last-wins, so synthetic CI can shrink input_size/segments without
# changing the real-data command lines.
TEST_FLAGS="${TEST_FLAGS:-}"

assert_acc() {  # $1 = combine output log, $2 = expected % (or "any"), $3 = tag
  python - "$1" "$2" "$3" <<'EOF'
import re, sys
log, want, tag = open(sys.argv[1]).read(), sys.argv[2], sys.argv[3]
accs = [float(m) for m in re.findall(r"Accuracy: ([0-9.]+)", log)]
assert accs, f"{tag}: no accuracy line in combine output:\n{log}"
got = accs[-1] * 100.0
if want == "any":
    print(f"PARITY OK [{tag}]: pipeline completed, fused accuracy "
          f"{got:.2f}% computed (synthetic stand-in)")
else:
    want = float(want)
    assert abs(got - want) < 0.05, f"{tag}: got {got:.2f}%, want {want}%"
    print(f"PARITY OK [{tag}]: {got:.2f}% == {want}%")
EOF
}

if [ -n "${SCORES:-}" ]; then
  CV="$SCORES/hmdb51_coviar"
  GAN="$SCORES/hmdb51_gan/split${SPLIT}/mv_score_model_best.npz"
  for f in "$CV/iframe/split${SPLIT}/iframe_score_model_best.npz" \
           "$CV/mv/split${SPLIT}/mv_score_model_best.npz" \
           "$CV/residual/split${SPLIT}/residual_score_model_best.npz"; do
    [ -f "$f" ] || { echo "SKIP: missing $f"; exit 0; }
  done
  python -m dmcnet_tpu.cli.combine \
    --iframe "$CV/iframe/split${SPLIT}/iframe_score_model_best.npz" \
    --mv "$CV/mv/split${SPLIT}/mv_score_model_best.npz" \
    --res "$CV/residual/split${SPLIT}/residual_score_model_best.npz" \
    | tee "$OUT/coviar.log"
  if [ "$SPLIT" = 1 ]; then
    assert_acc "$OUT/coviar.log" 62.03 "CoViAR 3-mod split1"
  fi
  if [ -f "$GAN" ]; then
    python -m dmcnet_tpu.cli.combine \
      --iframe "$CV/iframe/split${SPLIT}/iframe_score_model_best.npz" \
      --mv "$CV/mv/split${SPLIT}/mv_score_model_best.npz" \
      --res "$CV/residual/split${SPLIT}/residual_score_model_best.npz" \
      --flow "$GAN" | tee "$OUT/gan.log"
    if [ "$SPLIT" = 1 ]; then
      assert_acc "$OUT/gan.log" 64.05 "4-mod + DMC split1"
    fi
  else
    echo "SKIP (GAN row): missing $GAN"
  fi
  exit 0
fi

for v in DATA_ROOT TEST_LIST CKPTS; do
  [ -n "${!v:-}" ] || { echo "SKIP: \$$v not set (and no \$SCORES)"; exit 0; }
done
for f in iframe mv residual dmc_gan; do
  [ -f "$CKPTS/$f.pth.tar" ] || { echo "SKIP: missing $CKPTS/$f.pth.tar"; exit 0; }
done

# 25-segment / 10-crop protocol per modality (reference test.py defaults).
# --plain 1: CoViAR-trained TSN checkpoints classify the modality directly
# (the released iframe/mv/residual models are plain TSNs from the CoViAR
# repo — reference README.md "Training DMC-Net requires CoViAR models";
# the reference's own test.py cannot score them, cli/test.py --plain can).
for rep in iframe mv residual; do
  python -m dmcnet_tpu.cli.test \
    --data-name hmdb51 --representation "$rep" --arch resnet18 \
    --plain 1 --mv_minmaxnorm 1 \
    --data-root "$DATA_ROOT" --test-list "$TEST_LIST" \
    --weights "$CKPTS/$rep.pth.tar" \
    --test_segments 25 --test-crops 10 \
    --save-scores "$OUT/${rep}_score.npz" $TEST_FLAGS
done
# DMC stream: the GAN recipe's eval flags (examples/hmdb51_gan/run.sh)
python -m dmcnet_tpu.cli.test \
  --data-name hmdb51 --representation mv --arch resnet18 \
  --arch_estimator DenseNetTiny --arch_d Discriminator \
  --mv_minmaxnorm 1 --flow_ds_factor 16 --gen_flow_or_delta 1 \
  --data-root "$DATA_ROOT" --test-list "$TEST_LIST" \
  --weights "$CKPTS/dmc_gan.pth.tar" \
  --test_segments 25 --test-crops 10 \
  --save-scores "$OUT/dmc_score.npz" $TEST_FLAGS

python -m dmcnet_tpu.cli.combine \
  --iframe "$OUT/iframe_score.npz" --mv "$OUT/mv_score.npz" \
  --res "$OUT/residual_score.npz" --flow "$OUT/dmc_score.npz" \
  | tee "$OUT/full.log"
if [ "$SPLIT" = 1 ]; then
  assert_acc "$OUT/full.log" "$EXPECT_FULL" "full pipeline split1"
fi
