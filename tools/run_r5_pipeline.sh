#!/bin/bash
# Round-5 TPU pipeline: serializes the remaining VERDICT-r4 measurement
# items on the one chip (one host core — never run stages concurrently):
#   0. wait for the in-flight 100k claim-matrix queue (if a PID is given)
#   1. render the claim-matrix table (runs/claim_matrix/table_100k.md)
#   2. softclip cross-check jax legs on TPU (VERDICT r4 #3) — identical
#      flags to tools/run_softclip_xcheck_chain.sh's CPU legs (the 2x2's
#      torch legs are CPU-only; MCC trajectories are hardware-independent
#      up to float noise, and the TPU runs 10k steps in minutes, not 10h)
#   3. noisy-KITTI band, 3 seeds x 20k (VERDICT r4 #4)
#   4. KITTI ensemble validation, serial-vs---seeds 3 wall + MCC (#6)
#   5. seed-2 full 30k schedule at true N via the resumable --scan
#      runner — also yields the --scan throughput number (#5 + #7)
# Every stage is guarded by its output, so the script can be relaunched
# after a crash and it continues where it stopped.
#
# Usage: tools/run_r5_pipeline.sh [QUEUE_PID]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
LOG=runs/r5_pipeline.log
mkdir -p runs
stage() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ "${1:-}" ] && [ -d "/proc/$1" ]; then
  stage "waiting for claim-matrix queue (pid $1)"
  while [ -d "/proc/$1" ]; do sleep 30; done
fi
stage "claim-matrix queue done"

# 1. table
python -u tools/claim_matrix.py --table-only --steps 100000 \
  --out runs/claim_matrix > runs/claim_matrix/table_100k.md 2>>"$LOG"
stage "table rendered: runs/claim_matrix/table_100k.md"

# 2. softclip jax legs on TPU
jax_leg() {  # $1 = dir suffix, $2... = extra flags
  local tag=$1; shift
  [ -s "runs/softclip_xcheck/jax_$tag/log.csv" ] && \
    [ "$(wc -l < runs/softclip_xcheck/jax_$tag/log.csv)" -ge 11 ] && \
    { stage "jax_$tag complete, skip"; return 0; }
  stage "softclip jax_$tag (TPU)"
  python -u -m cl_ica_tpu.cli.main_3dident \
    --mode unsupervised --dummy-mixing \
    --offline-dataset fixtures/td_nonper_16k_8 \
    --non-periodic-rotation-and-color --non-periodical-conditional l1 \
    --unsupervised-loss l1 --sigma 0.1 --batch-size 512 \
    --iterations 10000 --n-log-steps 1000 --n-eval-samples 4096 \
    --seed 0 --log-dir "runs/softclip_xcheck/jax_$tag" "$@" \
    2>&1 | tee "runs/softclip_xcheck/jax_$tag.log" | tail -2 >> "$LOG"
  return "${PIPESTATUS[0]}"
}
jax_leg fix --box-constraint fix || stage "jax_fix FAILED"
jax_leg none || stage "jax_none FAILED"

# 3. noisy band (script is itself resume-guarded per seed x segment)
if [ ! -f runs/kitti_noisy/out/nb/2/evaluation/it20000.done ]; then
  stage "noisy-KITTI band (3 seeds x 20k)"
  bash tools/run_kitti_noisy_band.sh >> "$LOG" 2>&1 || stage "noisy band FAILED"
else
  stage "noisy band complete, skip"
fi

# 4. ensemble validation (serial + --seeds 3, timed)
if [ ! -f runs/kitti_ens_val/wall.log ] || \
   ! grep -q "ens done rc=0" runs/kitti_ens_val/wall.log 2>/dev/null; then
  stage "KITTI ensemble validation"
  bash tools/run_kitti_ensemble_validation.sh >> "$LOG" 2>&1 || stage "ens val FAILED"
else
  stage "ensemble validation complete, skip"
fi

# 5. seed-2 full 30k at true N (resumable --scan segments; also the
#    --scan throughput measurement vs the r3 eager 1,470 pairs/s)
if [ ! -f runs/td250k64_30k_s2/model.pth ] || \
   ! grep -q "=== done" runs/td250k64_30k_s2.log 2>/dev/null; then
  stage "seed-2 30k true-N (resumable scan segments)"
  bash tools/run_3dident_resumable.sh fixtures/td_nonper_250k_64 \
    runs/td250k64_30k_s2 2 30000 >> /dev/null 2>&1 || stage "seed2 FAILED"
else
  stage "seed2 complete, skip"
fi
stage "pipeline done"
