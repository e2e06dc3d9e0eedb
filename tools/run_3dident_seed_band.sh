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
DATA=${1:?dataset dir}
PREFIX=${2:?output prefix}
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
  echo "seed $seed exit ${PIPESTATUS[0]}" | tee -a "$name.log"
done
