#!/bin/bash
# Softclip-plateau cross-check, full 2x2 (VERDICT r3 #4): torch
# (reference modules) vs jax (our stack), softclip head vs unconstrained
# head, all on the SAME NN-quantized Box^10 Laplace(sigma=0.1) latent
# regime (16,384-point corpus, batch 512, lr 1e-4, 10k steps).
#
# torch curves: tools/torch_softclip_plateau.py (reference encoders/
# layers/losses imported from the read-only checkout).
# jax curves: our main_3dident --dummy-mixing on a 16,384-point latent
# fixture — the same latent path the reference's --dummy-mixing drives
# (main_3dident.py:348-364,470-473).
#
# Everything is CPU-only (torch has no TPU; jax forced to local CPU by
# REPLACING PYTHONPATH, which drops the axon sitecustomize hook) and
# serialized — one core on this host.
#
# Usage: tools/run_softclip_xcheck_chain.sh [WAIT_PID]
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=runs/softclip_xcheck
mkdir -p "$OUT"

if [ "${1:-}" ] && [ -d "/proc/$1" ]; then
  echo "waiting for running torch job (pid $1)..."
  while [ -d "/proc/$1" ]; do sleep 20; done
fi

if [ ! -f "$OUT/none.jsonl" ]; then
  echo "=== torch --head none (reference stack, unconstrained control)"
  PYTHONPATH=/root/repo nice -n 19 python -u tools/torch_softclip_plateau.py \
    --head none --steps 10000 --out "$OUT/none.jsonl" 2>&1 | tee "$OUT/none.log"
fi

jax_run() {  # $1 = dir suffix, $2... = extra flags
  local tag=$1; shift
  [ -f "$OUT/jax_$tag/log.csv" ] && { echo "jax_$tag exists, skip"; return; }
  echo "=== jax $tag (our stack, dummy-mixing latent path)"
  # Replacing PYTHONPATH drops the axon sitecustomize hook, but the
  # global JAX_PLATFORMS=axon export remains — without the plugin that
  # fails backend init. Force the local CPU backend explicitly.
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo nice -n 19 python -u -m cl_ica_tpu.cli.main_3dident \
    --mode unsupervised --dummy-mixing \
    --offline-dataset fixtures/td_nonper_16k_8 \
    --non-periodic-rotation-and-color --non-periodical-conditional l1 \
    --unsupervised-loss l1 --sigma 0.1 --batch-size 512 \
    --iterations 10000 --n-log-steps 1000 --n-eval-samples 4096 \
    --seed 0 --log-dir "$OUT/jax_$tag" "$@" 2>&1 | tee "$OUT/jax_$tag.log"
}

jax_run fix --box-constraint fix
jax_run none
echo "=== chain done"
