"""Fused-vs-materialized InfoNCE loss benchmark.

Times ONE loss fwd+bwd (grads w.r.t. all three reconstruction inputs,
the shape the encoder backward consumes) for the LpSimCLR loss at the
given --p (default 2, the MXU-tile kernel; --p 0 benches the
dot-product SimCLR path: ops.fused_dot_lse vs the materialized MXU
matmul+logsumexp), comparing:

  jnp    — losses.pairwise_lp_distance: B×B distances materialized in
           HBM via the MXU matmul identity (reference losses.py:436-450
           semantics), XLA-fused logsumexp;
  fused  — ops/infonce_pallas.fused_neg_lse: flash-style streaming
           tiles, p=2 distance + both backward weighted-difference sums
           on the MXU, B×B never touches HBM.

Run on the TPU backend (default axon env):

    python -u tools/bench_infonce_fused.py [--n 10] [--iters 50]
        [--batches 6144,16384,65536]

Prints one JSON line per (B, variant) with ms/call; the jnp variant
reports oom=true where the materialized path cannot allocate. Values
are cross-checked (|Δloss| printed) so the timing compares equal math.
Sync is via a value fetch — on this backend block_until_ready returns
before remote execution finishes (CLAUDE.md gotcha).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", type=str, default="6144,16384,65536")
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--p", type=float, default=2.0,
                    help="loss order; 0 benches the dot-product SimCLR "
                         "path (ops.fused_dot_lse vs materialized MXU "
                         "matmul+logsumexp)")
    args = ap.parse_args()

    from cl_ica_tpu.losses import LpSimCLRLoss, SimCLRLoss

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    ref_loss = {}
    for b in (int(x) for x in args.batches.split(",")):
        z1 = jnp.asarray(rng.normal(size=(b, args.n)), jnp.float32)
        z2 = z1 + 0.05 * jnp.asarray(rng.normal(size=(b, args.n)), jnp.float32)
        z3 = jnp.asarray(rng.normal(size=(b, args.n)), jnp.float32)

        for variant, use_fused in (("jnp", False), ("fused", True)):
            if args.p == 0:
                loss_obj = SimCLRLoss(tau=args.tau, use_fused=use_fused)
            else:
                loss_obj = LpSimCLRLoss(
                    p=args.p, tau=args.tau, simclr_compatibility_mode=True,
                    use_fused=use_fused,
                )

            def objective(a, bb, c):
                total, _, _ = loss_obj.loss(None, None, None, a, bb, c)
                return total

            step = jax.jit(jax.value_and_grad(objective, argnums=(0, 1, 2)))
            rec = {"b": b, "n": args.n, "p": args.p, "variant": variant}
            try:
                val, grads = step(z1, z2, z3)
                lv = float(val)  # sync + warmup
                rec["loss"] = lv
                if variant == "jnp":
                    ref_loss[b] = lv
                elif b in ref_loss:
                    rec["dloss_vs_jnp"] = abs(lv - ref_loss[b])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    val, grads = step(z1, z2, z3)
                _ = float(val) + float(grads[0][0, 0])
                dt = (time.perf_counter() - t0) / args.iters
                rec["ms"] = dt * 1e3
                rec["pairs_per_sec"] = b / dt
            except Exception as e:  # noqa: BLE001 — OOM is a result here
                rec["oom"] = True
                rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
