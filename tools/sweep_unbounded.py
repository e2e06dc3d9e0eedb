"""Hyperparameter sweep for the unbounded (R^10) + Laplace config
(VERDICT r1 #4: close the 0.90-vs-0.98 MCC gap).

Runs main_mlp in-process over a grid of (marginal, lr, tau, c-param)
at full scale (n=10, batch 6144, 100k unsupervised steps — ~6 min/run
on one v5e chip) and prints a result table.

Usage: python -u tools/sweep_unbounded.py [--steps 100001] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


BASE = [
    "--space-type", "unbounded", "--c-p", "1", "--p", "1",
    "--only-unsupervised", "--more-unsupervised", "1",
    "--seed", "0", "--num-eval-batches", "3",
]

GRID = [
    # (tag, extra argv)
    ("baseline m-p1 lr1e-4", ["--m-p", "1"]),
    ("m-p2 (Normal marginal)", ["--m-p", "2"]),
    ("lr 3e-4", ["--m-p", "1", "--lr", "3e-4"]),
    ("lr 1e-3", ["--m-p", "1", "--lr", "1e-3"]),
    ("tau 0.5", ["--m-p", "1", "--tau", "0.5"]),
    ("c-param 0.1", ["--m-p", "1", "--c-param", "0.1"]),
    ("m-p2 + lr 3e-4", ["--m-p", "2", "--lr", "3e-4"]),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100001)
    parser.add_argument("--log-steps", type=int, default=2500)
    parser.add_argument("--quick", action="store_true",
                        help="2.5k steps per run (smoke)")
    parser.add_argument("--out", type=str, default="/tmp/sweep_unbounded.json")
    args = parser.parse_args()
    steps = 2501 if args.quick else args.steps

    from cl_ica_tpu.cli.main_mlp import main as mlp_main

    results = []
    for tag, extra in GRID:
        argv = BASE + extra + [
            "--n-steps", str(steps), "--n-log-steps", str(args.log_steps),
        ]
        t0 = time.time()
        print(f"\n=== {tag}: {' '.join(argv)}", flush=True)
        lin, perm = mlp_main(argv)
        dt = time.time() - t0
        print(f"=== {tag}: linR2={lin:.4f} MCC={perm:.4f} ({dt:.0f}s)",
              flush=True)
        results.append({"tag": tag, "argv": argv, "linear_r2": lin,
                        "mcc": perm, "seconds": dt})
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)

    print("\n==== summary ====")
    for r in sorted(results, key=lambda r: -r["mcc"]):
        print(f"{r['mcc']:.4f}  linR2={r['linear_r2']:.4f}  {r['tag']}")


if __name__ == "__main__":
    main()
