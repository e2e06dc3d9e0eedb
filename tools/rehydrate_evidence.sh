#!/bin/bash
# Rehydrate the run-artifact evidence after a VM reset.
#
# fixtures/ and runs/ do NOT survive VM resets (CLAUDE.md). Everything
# in them is deterministic given seeds, so this script regenerates the
# corpora and re-runs the cheapest run that backs each headline claim
# in EXPERIMENTS.md. Budget: ~35 min on one v5e + the 1-core host
# (corpus gen ~7 min CPU; KITTI train->eval ~4 min; 3DIdent 3k steps
# ~20 min, dispatch-bound at 64^2 — see CLAUDE.md gotchas; do NOT run
# pytest concurrently).
#
# Usage: tools/rehydrate_evidence.sh [--full]
#   default: KITTI seed-0 20k (MCC 0.9866) + 3DIdent sigma=0.1 seed-0
#            3k steps (peak band 0.974 +/- 0.0003 across seeds @2-3k).
#   --full:  also the complete 10k trajectories for seeds 0 1 2
#            (~1h05m per seed; the full EXPERIMENTS seed band).
set -eu -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-$PWD}
FULL=${1:-}

if [ ! -f fixtures/kitti_synth/kitti_peds_v2.pickle ]; then
  echo "=== KITTI synthetic corpus (150 seq / 4350 pairs, seed 0)"
  python -u -m cl_ica_tpu.tools.make_synthetic_kitti \
    --output-dir fixtures/kitti_synth --seed 0
fi

if [ ! -f fixtures/kitti_synth_noisy/kitti_peds_v2.pickle ]; then
  echo "=== KITTI noisy-mask corpus (segmentation-noise 0.3, seed 0)"
  python -u -m cl_ica_tpu.tools.make_synthetic_kitti \
    --output-dir fixtures/kitti_synth_noisy --seed 0 \
    --segmentation-noise 0.3
fi

# r5 noise-response sweep points (EXPERIMENTS r5 noisy-band section)
for s in 0.15 0.5; do
  d="fixtures/kitti_synth_noisy$(echo "$s" | tr -d .)"
  if [ ! -f "$d/kitti_peds_v2.pickle" ]; then
    echo "=== KITTI noisy-mask corpus (segmentation-noise $s, seed 0)"
    python -u -m cl_ica_tpu.tools.make_synthetic_kitti \
      --output-dir "$d" --seed 0 --segmentation-noise "$s"
  fi
done

# 16k-point 8^2 latent fixture (softclip cross-check jax legs; only
# raw_latents.npy matters — --dummy-mixing never reads the images)
if [ ! -f fixtures/td_nonper_16k_8/raw_latents.npy ]; then
  echo "=== 3DIdent 16k/8^2 fixture (softclip xcheck; ~30 s)"
  python -u -m cl_ica_tpu.tools.make_synthetic_3dident \
    --output-folder fixtures/td_nonper_16k_8 \
    --n-points 16384 --image-size 8 --seed 0 \
    --non-periodic-rotation-and-color
fi

# Gate on the packed store: it is the LAST-written, atomically-renamed
# artifact (raw_latents.npy lands first, before the ~7-min render), so
# an interrupted generation re-runs instead of skipping.
if [ ! -f fixtures/td_nonper_250k_64/images_packed_64x64.u8 ]; then
  echo "=== 3DIdent true-N corpus (250k points, 64^2, seed 0; ~7 min, ~3 GB)"
  python -u -m cl_ica_tpu.tools.make_synthetic_3dident \
    --output-folder fixtures/td_nonper_250k_64 \
    --n-points 250000 --image-size 64 --seed 0 \
    --non-periodic-rotation-and-color
fi

echo "=== KITTI seed-0 quality run (20k steps, train->auto-eval; ~4 min)"
mkdir -p runs/kitti_s0
python -u -m cl_ica_tpu.cli.main_kitti \
  --dset-dir fixtures/kitti_synth --experiment-dir runs/kitti_s0 \
  --seed 0 --max-iter 20000 2>&1 | tee runs/kitti_s0.log

if [ "$FULL" = "--full" ]; then
  tools/run_3dident_seed_band.sh fixtures/td_nonper_250k_64 runs/td250k64 10000 0 1 2
else
  echo "=== 3DIdent sigma=0.1 seed-0, first 3k steps (peak region; ~20 min)"
  tools/run_3dident_seed_band.sh fixtures/td_nonper_250k_64 runs/td250k64 3000 0
fi

# --- r4 evidence logs (VM resets erase runs/) ---

# Both stages are guarded like everything above: relaunching the
# script must not re-run bench (TPU time) or the deadline probe (its
# 70/90 s dispatches intentionally crash the shared relay worker), and
# a bench failure must not abort before the probe log is regenerated.
if [ ! -s runs/bench_r4_postfused.log ]; then
  echo "=== bench.py post-fused revalidation (runs/bench_r4_postfused.log)"
  python -u bench.py 2>&1 | tee runs/bench_r4_postfused.log || true
fi

if [ ! -s runs/probe_deadline_r4.log ]; then
  echo "=== relay dispatch-deadline probe (runs/probe_deadline_r4.log)"
  python -u tools/probe_dispatch_deadline.py 10 30 70 90 2>&1 \
    | tee runs/probe_deadline_r4.log || true
fi
