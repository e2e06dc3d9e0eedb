#!/bin/bash
# Crash-resilient single-seed 3DIdent run: wraps main_3dident in an
# auto-resume loop so transient remote-TPU worker crashes (observed r3
# and r4: "TPU worker process crashed or restarted", typically one-off
# service restarts) cost at most the steps since the last checkpoint
# instead of the whole multi-hour run. Requires the r4 full-fidelity
# resume path (--save-every + --resume restore {params, batch_stats,
# opt_state, step, RNG key} — trajectory identical to uninterrupted,
# tests/test_resume.py).
#
# Usage: tools/run_3dident_resumable.sh DATASET_DIR OUT_DIR SEED ITERS [EXTRA...]
set -u
DATA=$(realpath "${1:?dataset dir}")
OUT=${2:?output dir}
case "$OUT" in /*) ;; *) OUT="$PWD/$OUT" ;; esac
SEED=${3:?seed}
ITERS=${4:?iterations}
shift 4
cd "$(dirname "$0")/.."
# append (never override) so the host's TPU-routing sitecustomize stays
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
# Cap one device dispatch at ~150 scanned ResNet steps (~19 s chip time
# at 0.125 s/step). Evidence for a per-dispatch wall-time watchdog on
# the remote-TPU relay: a 20k-step MLP scan (~52 s) crashed the worker
# in r1 bring-up while 10k (~26 s) is proven stable, and r4's 1000-step
# ResNet segments (~125 s) crashed deterministically in the first
# segment. Overridable: callers may export a different value.
export CL_ICA_TPU_MAX_SCAN_LEN=${CL_ICA_TPU_MAX_SCAN_LEN:-150}
mkdir -p "$OUT"
MAX_TRIES=40
try=0
while :; do
  try=$((try + 1))
  echo "=== attempt $try (seed $SEED, $ITERS iters) $(date -u +%H:%M:%S)" | tee -a "$OUT.log"
  python -u -m cl_ica_tpu.cli.main_3dident \
    --mode unsupervised --batch-size 512 --bf16 --scan \
    --n-eval-samples 4096 --log-dir "$OUT" \
    --save-model "$OUT/model.pth" --save-every 2000 --resume \
    --offline-dataset "$DATA" \
    --non-periodic-rotation-and-color --non-periodical-conditional l1 \
    --unsupervised-loss l1 --sigma 0.1 --iterations "$ITERS" \
    --n-log-steps 1000 --seed "$SEED" "$@" 2>&1 | tee -a "$OUT.log"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 0 ]; then
    echo "=== done after $try attempt(s)" | tee -a "$OUT.log"
    exit 0
  fi
  if [ "$try" -ge "$MAX_TRIES" ]; then
    echo "=== giving up after $MAX_TRIES attempts (rc=$rc)" | tee -a "$OUT.log"
    exit "$rc"
  fi
  echo "=== attempt $try failed rc=$rc; resuming in 30s" | tee -a "$OUT.log"
  sleep 30
done
