"""Roofline/dispatch analysis of the KITTI scanned train chunk.

The r1 throughput table records 110k pairs/s (batch 64, with
augmentation) with no binding-resource analysis. This probe answers
"what limits the KITTI path" the same way the ResNet study did:
compiled cost_analysis (FLOPs + HLO bytes) per scanned chunk, wall time
per chunk (value-fetch synced — block_until_ready returns early on this
backend), and the achieved fractions of the chip's measured ceilings
(503 GB/s stream, ~145 TF/s bf16 matmul — EXPERIMENTS.md roofline
anchors).

Run on the TPU backend (keep the default axon env):

    python -u tools/profile_kitti.py [--augment] [--chunk 500] [--batch 64]

Uses a synthetic KittiMasks-format corpus (tools/make_synthetic_kitti)
generated into /tmp on first use — same pickle contract as
kitti_peds_v2.pickle (reference kitti_masks/dataset.py:27-57).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import types

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

CORPUS = "/tmp/kitti_prof/kitti_peds_v2.pickle"


def ensure_corpus():
    if not os.path.exists(CORPUS):
        from cl_ica_tpu.tools.make_synthetic_kitti import main as gen

        gen(["--output-dir", os.path.dirname(CORPUS)])
    return os.path.dirname(CORPUS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--augment", action="store_true",
                    help="paired augmentation inside the scan (the r1 "
                         "measurement config; default mirrors the "
                         "reference's un-augmented training)")
    ap.add_argument("--chunk", type=int, default=500,
                    help="scanned steps per dispatch (= --log-step)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4,
                    help="timed chunks (after 1 warmup)")
    args = ap.parse_args()

    from cl_ica_tpu.cli.kitti_solver import Solver
    from cl_ica_tpu.data.kitti import KittiMasks

    root = ensure_corpus()
    ds = KittiMasks(path=root, download=False,
                    transform="default" if args.augment else None)
    sargs = types.SimpleNamespace(
        ckpt_dir="/tmp/kitti_prof/ck", output_dir="/tmp/kitti_prof/out",
        max_iter=args.chunk * args.iters, z_dim=10, num_channel=1,
        log_step=args.chunk, save_step=10 ** 9, batch_size=args.batch,
        box_norm=0, lr=1e-4, beta1=0.9, beta2=0.999, p=1, seed=0,
    )
    os.makedirs(sargs.ckpt_dir, exist_ok=True)
    os.makedirs(sargs.output_dir, exist_ok=True)
    s = Solver(sargs, ds)

    arrays = s.device_sampler.arrays
    # under CL_ICA_TPU_DEBUG the solver wraps the jitted chunk in a
    # checkify driver (a plain function with no .lower); profile the
    # underlying jit in that case. NOTE: jax.jit objects carry a
    # __wrapped__ too (the raw Python fn), so unwrap only when .lower
    # is absent.
    chunk_jit = s._chunk
    while not hasattr(chunk_jit, "lower"):
        chunk_jit = chunk_jit.__wrapped__
    lowered = chunk_jit.lower(s.params, s.opt_state, s.key, arrays)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", float("nan"))
    gbytes = ca.get("bytes accessed", float("nan"))

    params, opt, key = s.params, s.opt_state, s.key
    # run the AOT executable directly — calling s._chunk would re-trace
    # and re-compile through the jit dispatch path (remote compiles are
    # ~minutes on this backend)
    params, opt, key, losses, _ = compiled(params, opt, key, arrays)
    _ = float(np.asarray(losses)[-1])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt, key, losses, _ = compiled(params, opt, key, arrays)
    _ = float(np.asarray(losses)[-1])
    dt = (time.perf_counter() - t0) / args.iters

    n = args.chunk
    pairs = args.batch // 2
    step_ms = dt / n * 1e3
    print(f"config: batch {args.batch} ({pairs} pairs), chunk {n}, "
          f"augment={args.augment}")
    print(f"chunk wall: {dt*1e3:.1f} ms  -> {step_ms:.3f} ms/step  "
          f"{pairs / (dt / n):.0f} pairs/s")
    # NOTE: XLA cost_analysis counts a while/scan BODY ONCE, not
    # x trip-count, so these are ~per-iteration graph costs (plus the
    # chunk's fixed part), NOT per-chunk totals — printed for scale
    # only. The binding resource at the reference batch is per-op
    # launch latency (sub-ms steps over tiny tensors): step time grows
    # ~2.4x when the batch grows 8x (64 -> 512).
    print(f"cost_analysis (scan body counted once): {flops/1e9:.2f} "
          f"GFLOP, {gbytes/1e6:.1f} MB")


if __name__ == "__main__":
    main()
