"""Binding-resource analysis of the MLP-mixing scanned train chunk.

Completes the per-path perf trio (ResNet: HBM-stream-bound at the byte
floor; KITTI: launch-latency/small-conv bound; this probe: the MLP
path). Reuses main_mlp's own constructors at the headline config
(sphere + vMF, p=2, batch 6144) so the measured step IS the driver's
step: sampling + frozen mixing + encoder + loss + Adam fused in one
lax.scan.

Run on the TPU backend (default axon env):

    python -u tools/profile_mlp.py [--n 10] [--batch 6144] [--chunk 500]

Prints ms/step, pairs/s, the scan-body cost_analysis (counted ONCE by
XLA, ≈ one step's graph), and achieved TF/s vs the measured 145 TF/s
matmul ceiling.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--batch", type=int, default=6144)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--p", type=float, default=2.0)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 Linear stack (main_mlp --bf16)")
    ap.add_argument("--fused-loss", action="store_true",
                    help="route the loss through the Pallas streaming-"
                         "logsumexp kernel (ops/infonce_pallas) instead "
                         "of the materialized B×B XLA path")
    args = ap.parse_args()

    import optax

    from cl_ica_tpu.cli.main_mlp import build_latent_space, parse_args
    from cl_ica_tpu.losses import LpSimCLRLoss, SimCLRLoss
    from cl_ica_tpu.models import construct_invertible_mlp, get_mlp
    from cl_ica_tpu.train import TrainState
    from cl_ica_tpu.train.trainer import make_scanned_synthetic_train_steps

    cli = parse_args([
        "--space-type", "sphere", "--c-p", "0", "--c-param", "20",
        "--n", str(args.n), "--batch-size", str(args.batch),
        "--p", str(int(args.p)), "--only-unsupervised", "--seed", "0",
    ])
    latent_space = build_latent_space(cli)
    fused = True if args.fused_loss else None
    loss = (
        LpSimCLRLoss(p=cli.p, tau=cli.tau, simclr_compatibility_mode=True,
                     use_fused=fused)
        if cli.p else SimCLRLoss(normalize=False, tau=cli.tau,
                                 use_fused=bool(fused))
    )
    np_rng = np.random.default_rng(0)
    g = construct_invertible_mlp(
        n=cli.n, n_layers=cli.n_mixing_layer, act_fct=cli.act_fct,
        cond_thresh_ratio=0.0, n_iter_cond_thresh=25000, rng=np_rng,
    )
    import jax.numpy as jnp

    f = get_mlp(
        n_in=cli.n, n_out=cli.n,
        layers=[cli.n * 10, cli.n * 50, cli.n * 50,
                cli.n * 50, cli.n * 50, cli.n * 10],
        output_normalization="fixed_sphere" if cli.p == 0 else None,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )

    params = f.init(jax.random.PRNGKey(1), jnp.zeros((2, cli.n)))
    optimizer = optax.adam(cli.lr)
    chunk = make_scanned_synthetic_train_steps(
        latent_space.sample_pair, g, lambda p, x: f.apply(p, x),
        loss, optimizer, cli.batch_size, n_inner=args.chunk,
    )
    state = TrainState.create(
        params, optimizer.init(params), jax.random.PRNGKey(2)
    )

    lowered = chunk.lower(state)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", float("nan"))
    gbytes = ca.get("bytes accessed", float("nan"))

    # AOT executable directly (jit dispatch would re-trace); donation
    # invalidates the consumed state, which we rebind every call
    state, metrics = compiled(state)
    _ = float(np.asarray(metrics["loss"])[-1])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = compiled(state)
    _ = float(np.asarray(metrics["loss"])[-1])
    dt = (time.perf_counter() - t0) / args.iters

    n = args.chunk
    step_ms = dt / n * 1e3
    print(f"config: n={cli.n} batch {cli.batch_size} pairs, p={cli.p}, "
          f"chunk {n}")
    print(f"chunk wall: {dt*1e3:.1f} ms -> {step_ms:.3f} ms/step  "
          f"{cli.batch_size / (dt / n):.0f} pairs/s")
    print(f"scan body (counted once by cost_analysis): {flops/1e9:.2f} "
          f"GFLOP, {gbytes/1e6:.1f} MB")
    fl = flops / (dt / n)
    print(f"achieved ~{fl/1e12:.1f} TF/s ({fl/145e12*100:.0f}% of the "
          f"measured matmul ceiling)")


if __name__ == "__main__":
    main()
