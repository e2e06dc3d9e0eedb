"""Torch cross-check for the late-run norm drift (VERDICT r2 weak #5).

Question: our KITTI runs peak early (MCC 0.98+ by 20k steps on the
synthetic corpus) and decay by the end of the reference's 300k-step
default schedule. Is this a framework artifact or a property of the
objective the reference shares?

This script answers it by running the REFERENCE'S OWN stack — imported
from the read-only checkout, not re-implemented: `kitti_masks.model.
BetaVAE_H`, `losses.LpSimCLRLoss(p=1, simclr_compatibility_mode=True)`,
`kitti_masks.dataset.KittiMasks` + `custom_collate` (transform=None, the
reference's behavioral training default — its evaluate/train transform
branch at dataset.py:158-163 is a no-op) — on the SAME synthetic corpus
at the main_kitti default config (batch 64 = 32 pairs, Adam 1e-4,
max_delta_t=1), and scoring MCC at intervals with cl_ica_tpu's evaluator
(the torch codes go through the identical dis-lib protocol + Hungarian).

Usage (torch CPU; slow — run in the background):
    PYTHONPATH=/root/repo python -u tools/torch_kitti_drift.py \
        <data_dir_containing_pickle> <max_steps> <out_jsonl> [eval_every]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch
from torch.utils.data import DataLoader

# torchvision is not in this image; the reference dataset imports it but
# only touches transforms.* inside its (never-taken at transform=None)
# "default" branch — a bare stub satisfies the import
if "torchvision" not in sys.modules:
    import types

    _tv = types.ModuleType("torchvision")
    _tr = types.ModuleType("torchvision.transforms")
    _tv.transforms = _tr
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tr

from kitti_masks.dataset import KittiMasks as RefKitti, custom_collate
from kitti_masks.model import BetaVAE_H
import losses as ref_losses


def main():
    data_dir = sys.argv[1]
    max_steps = int(sys.argv[2])
    out_path = sys.argv[3]
    eval_every = int(sys.argv[4]) if len(sys.argv) > 4 else 10000

    # our evaluator (jax on CPU) — import AFTER torch to keep both happy
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cl_ica_tpu.cli.kitti_evaluate import generate_batch_factor_code
    from cl_ica_tpu.data.kitti import KittiMasks as OurKitti
    from cl_ica_tpu.evaluation import compute_mcc

    torch.manual_seed(0)
    np.random.seed(0)
    ds = RefKitti(path=data_dir, max_delta_t=1)  # transform=None (ref default)
    loader = DataLoader(
        ds, batch_size=32, shuffle=True, num_workers=0, drop_last=True,
        collate_fn=custom_collate,
    )
    net = BetaVAE_H(z_dim=10, nc=1, box_norm=False)
    loss_fn = ref_losses.LpSimCLRLoss(
        p=1, tau=1.0, simclr_compatibility_mode=True
    )
    opt = torch.optim.Adam(net.parameters(), lr=1e-4, betas=(0.9, 0.999))

    eval_ds = OurKitti(path=data_dir, transform=None, max_delta_t=1)

    def rep_fn(obs):
        with torch.no_grad():
            return net(torch.from_numpy(np.asarray(obs, np.float32))).numpy()

    def evaluate(step):
        net.eval()
        mus, ys = generate_batch_factor_code(
            eval_ds, rep_fn, 2000, np.random.RandomState(0), 64
        )
        scores = compute_mcc(mus, ys, correlation_fn="Pearson")
        norm = float(np.linalg.norm(mus.T, axis=1).mean())
        net.train()
        rec = {
            "step": step,
            "mcc": float(scores["meanabscorr"]),
            "mean_znorm": norm,
            "wall": time.time(),
        }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    evaluate(0)
    step = 0
    t0 = time.time()
    while step < max_steps:
        for x, _ in loader:
            mu = net(x)
            z1, z2 = mu[::2], mu[1::2]
            z3 = torch.roll(z1, 1, 0)
            total, _, _ = loss_fn(None, None, None, z1, z2, z3)
            opt.zero_grad()
            total.backward()
            opt.step()
            step += 1
            if step % eval_every == 0:
                rate = step / (time.time() - t0)
                print(f"step {step} ({rate:.1f} steps/s)", flush=True)
                evaluate(step)
            if step >= max_steps:
                break
    evaluate(step)


if __name__ == "__main__":
    main()
