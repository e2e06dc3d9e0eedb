#!/bin/bash
# Multi-seed sigma=0.1 3DIdent trajectories (the REAL_DATA.md run plan).
#
# Usage:
#   tools/run_3dident_seed_band.sh DATASET_DIR OUT_PREFIX [ITERS] [SEEDS...]
# e.g.
#   tools/run_3dident_seed_band.sh fixtures/td_nonper_250k_64 runs/td250k 10000 0 1 2
#
# Each seed runs the reference-shaped config (unconstrained head, l1
# conditional, l1 loss, sigma 0.1, batch 512, bf16) sequentially —
# sequential on purpose: one chip, and concurrent runs contend for the
# host dispatch core (CLAUDE.md gotcha). Logs + checkpoints land in
# ${OUT_PREFIX}_s${SEED}/.
set -u
# resolve paths against the INVOKER's cwd before cd-ing to the repo
DATA=$(realpath "${1:?dataset dir}")
PREFIX=${2:?output prefix}
case "$PREFIX" in /*) ;; *) PREFIX="$PWD/$PREFIX" ;; esac
ITERS=${3:-10000}
shift 3 2>/dev/null || shift $#
SEEDS=${@:-0 1 2}
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-$PWD}
for seed in $SEEDS; do
  name="${PREFIX}_s${seed}"
  mkdir -p "$name"
  echo "=== seed $seed -> $name"
  python -u -m cl_ica_tpu.cli.main_3dident \
    --mode unsupervised --batch-size 512 --bf16 \
    --n-eval-samples 4096 --log-dir "$name" \
    --save-model "$name/model.pth" \
    --offline-dataset "$DATA" \
    --non-periodic-rotation-and-color --non-periodical-conditional l1 \
    --unsupervised-loss l1 --sigma 0.1 --iterations "$ITERS" \
    --n-log-steps 1000 --seed "$seed" 2>&1 | tee "$name.log"
  rc=${PIPESTATUS[0]}
  echo "seed $seed exit $rc" | tee -a "$name.log"
  if [ "$rc" -ne 0 ]; then
    # a dead backend (e.g. the TPU relay, EXPERIMENTS r3) would fail
    # every remaining seed too — stop so the operator can intervene
    echo "aborting band after failed seed $seed"
    exit "$rc"
  fi
done
