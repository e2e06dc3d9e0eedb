#!/bin/bash
# KITTI ensemble validation (VERDICT r4 weak #7 / next #6): one S=3
# 20k-step `main_kitti --seeds 3` run vs one serial seed, both timed on
# the same corpus, validating the EnsembleSolver docstring's two
# claims (cli/kitti_solver.py:366-374):
#   * "S seeds cost ~1x the wall of one serial seed" — wall(ensemble) /
#     wall(serial seed 0);
#   * lanes are statistically identical to serial runs — per-lane final
#     MCC vs the serial band's per-seed MCC (run tools/
#     run_kitti_noisy_band.sh first for the serial numbers, or compare
#     lane 0 against the serial run this script times).
#
# Usage: tools/run_kitti_ensemble_validation.sh [DSET] [OUT]
set -u -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
DSET=${1:-fixtures/kitti_synth_noisy}
OUT=${2:-runs/kitti_ens_val}
mkdir -p "$OUT"

run_timed() {  # $1 tag, rest = extra args
  local tag=$1; shift
  echo "=== $tag start $(date -u +%H:%M:%S)" | tee -a "$OUT/wall.log"
  local t0=$SECONDS
  python -u -m cl_ica_tpu.cli.main_kitti \
    --dset-dir "$DSET" --experiment-dir "$tag" \
    --output-dir "$OUT/out" --ckpt-dir "$OUT/ck" --log-dir "$OUT/log" \
    --seed 0 --max-iter 20000 --save-step 10000 \
    --log-step 1000 --specify mcc "$@" 2>&1 | tee "$OUT/$tag.log"
  local rc=${PIPESTATUS[0]}
  echo "=== $tag done rc=$rc wall $((SECONDS - t0))s" | tee -a "$OUT/wall.log"
  return "$rc"
}

run_timed serial          || exit 1
run_timed ens --seeds 3   || exit 1

echo "=== final MCCs"
for d in "$OUT"/out/serial/0 "$OUT"/out/ens/0 "$OUT"/out/ens/1 "$OUT"/out/ens/2; do
  j="$d/evaluation/last/mean/mcc/evaluation_results.json"
  [ -f "$j" ] && python -c "
import json
d = json.load(open('$j'))
print('$d'.split('out/')[-1], 'MCC', round(next(iter(d.values())), 4))"
done
cat "$OUT/wall.log"
