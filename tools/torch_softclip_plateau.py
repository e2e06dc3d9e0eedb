"""Torch cross-check for the Softclip 0.84 MCC plateau (VERDICT r3 #4).

Question: our box-constrained 3DIdent runs (`--box-constraint fix`, the
SoftclipLayer head) plateau at MCC ~0.84 while the reference-default
unconstrained head reaches ~0.97 on the same fixture (EXPERIMENTS r2).
We attributed the cap to the SoftclipLayer head itself — its sigmoid
saturation fighting the Laplace objective's axis sharpening — but that
attribution rested solely on our implementation. Is the cap shared
reference behavior?

This script answers it by running the REFERENCE'S OWN stack, imported
from the read-only checkout, not re-implemented — exactly its
`--dummy-mixing` latent path (main_3dident.py:348-364,470-473):

  - `spaces.NBoxSpace(10)` uniform marginal + Laplace(sigma) conditional
    (`setup_latent_space`, main_3dident.py:156-196; the product of the
    position/rotation box spaces with one shared conditional is
    distributionally NBox(10)),
  - NN-quantized pairs against a fixed offline corpus — z1 drawn from
    the corpus, z2 = nearest corpus neighbor of a conditional sample,
    second neighbor on self-collision (threedident_dataset.py:101-131),
    matching the quantization regime the 0.84 plateau was measured in,
  - mixing `g` = `invertible_network_utils.construct_invertible_mlp`
    (3 layers, the dummy-mixing branch, main_3dident.py:765-771),
  - encoder `f` = `encoders.get_mlp(... layers=[100,500,500,500,500,
    100])` + head (main_3dident.py:348-364): `SoftclipLayer(n=10,
    fixed_abs_bound=True)` for --head softclip (the `--box-constraint
    fix` config, main_3dident.py:312-315) or identity for --head none,
  - loss = `losses.LpSimCLRLoss(p=1, tau=1.0,
    simclr_compatibility_mode=True, pow=True)` (the `l1` branch,
    main_3dident.py:413-416), negatives via `torch.roll`
    (main_3dident.py:483-486), Adam lr=1e-4 (main_3dident.py:451-452),

scoring linear R2 / permutation MCC at intervals through cl_ica_tpu's
evaluator with the same call signature as our main_3dident eval
(cli/main_3dident.py:694-700) — so any plateau difference is the
reference torch modules, not the metric.

Usage (torch CPU; ~0.1 s/step at batch 512 — run nice'd in background):
    PYTHONPATH=/root/repo python -u tools/torch_softclip_plateau.py \
        --head softclip --steps 10000 --out runs/softclip_xcheck/softclip.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

import encoders as ref_encoders
import invertible_network_utils as ref_inv
import latent_spaces as ref_latent_spaces
import layers as ref_layers
import losses as ref_losses
import spaces as ref_spaces

N = 10


def nn_match(query: torch.Tensor, corpus: torch.Tensor,
             anchor_idx: torch.Tensor) -> torch.Tensor:
    """Top-2 NN against the corpus, second neighbor on self-collision
    (the reference's FAISS k=2 protocol, threedident_dataset.py)."""
    d = torch.cdist(query, corpus)  # (B, N_points)
    top2 = torch.topk(d, k=2, largest=False).indices  # (B, 2)
    first = top2[:, 0]
    hit = first == anchor_idx
    return torch.where(hit, top2[:, 1], first)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", choices=("softclip", "none"), required=True)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--sigma", type=float, default=0.1)
    ap.add_argument("--n-points", type=int, default=16384,
                    help="offline-corpus size for NN quantization "
                         "(the r2 fixture scale); 0 = exact sampling")
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--eval-n", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args(argv)

    # our evaluator (jax on CPU) — import AFTER torch to keep both happy
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cl_ica_tpu.evaluation import (
        linear_disentanglement,
        permutation_disentanglement,
    )

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    space = ref_spaces.NBoxSpace(N)
    latent_space = ref_latent_spaces.LatentSpace(
        space,
        lambda sp, size, device: sp.uniform(size, device=device),
        lambda sp, z, size, device="cpu": sp.laplace(
            z, lbd=args.sigma, size=size, device=device
        ),
    )

    g = ref_inv.construct_invertible_mlp(
        N, n_layers=3, act_fct="leaky_relu",
        cond_thresh_ratio=0.0, n_iter_cond_thresh=25000,
    )
    for p in g.parameters():
        p.requires_grad = False

    mlp = ref_encoders.get_mlp(
        n_in=N, n_out=N,
        layers=[N * 10, N * 50, N * 50, N * 50, N * 50, N * 10],
        output_normalization=None,
    )
    if args.head == "softclip":
        head = ref_layers.SoftclipLayer(n=N, fixed_abs_bound=True)
    else:
        head = ref_layers.Lambda(lambda x: x)
    f = torch.nn.Sequential(mlp, head)

    loss_fn = ref_losses.LpSimCLRLoss(
        p=1, tau=1.0, simclr_compatibility_mode=True, pow=True
    )
    opt = torch.optim.Adam(f.parameters(), lr=1e-4)

    corpus = None
    if args.n_points:
        corpus = latent_space.sample_marginal(size=args.n_points, device="cpu")

    def sample_pair(size):
        if corpus is None:
            z1 = latent_space.sample_marginal(size=size, device="cpu")
            z2 = latent_space.sample_conditional(z1, size=size, device="cpu")
            return z1, z2
        idx1 = torch.randint(0, len(corpus), (size,))
        z1 = corpus[idx1]
        z2t = latent_space.sample_conditional(z1, size=size, device="cpu")
        return z1, corpus[nn_match(z2t, corpus, idx1)]

    def evaluate(step):
        f.eval()
        with torch.no_grad():
            if corpus is None:
                z = latent_space.sample_marginal(size=args.eval_n, device="cpu")
            else:
                z = corpus[torch.randint(0, len(corpus), (args.eval_n,))]
            hz = f(g(z)).numpy()
        z = z.numpy()
        (lin, _), _ = linear_disentanglement(
            z, hz, mode="r2", train_test_split=True
        )
        (mcc, _), _ = permutation_disentanglement(
            z, hz, mode="pearson", solver="munkres", rescaling=True
        )
        f.train()
        rec = {"step": step, "linear_r2": float(lin), "mcc": float(mcc),
               "head": args.head, "wall": time.time()}
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    evaluate(0)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        z1, z2 = sample_pair(args.batch_size)
        with torch.no_grad():
            x1, x2 = g(z1), g(z2)
        hz1, hz2 = f(x1), f(x2)
        hz3 = torch.roll(hz1, 1, 0)
        total, _, _ = loss_fn(None, None, None, hz1, hz2, hz3)
        opt.zero_grad()
        total.backward()
        opt.step()
        if step % args.eval_every == 0:
            print(f"step {step} ({step / (time.time() - t0):.1f} steps/s)",
                  flush=True)
            evaluate(step)
    if args.steps % args.eval_every:
        evaluate(args.steps)


if __name__ == "__main__":
    main()
