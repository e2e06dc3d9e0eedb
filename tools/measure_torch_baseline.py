"""Measure the reference's CPU training throughput (pairs/sec).

The reference repo publishes no benchmark numbers (BASELINE.md), so we
measure its configuration ourselves: ResNet-18 encoder + Lp-InfoNCE
contrastive step on 224x224 image pairs (main_3dident.py:30-36,104),
implemented in plain torch (torchvision is not installed here; the
architecture below is the standard ResNet-18 — identical layer/FLOP
structure to torchvision.models.resnet18(num_classes=n)).

Writes baseline_measured.json consumed by bench.py. Run once:
    python tools/measure_torch_baseline.py [--batch 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


def resnet18(num_classes=10):
    layers = [nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
              nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1)]
    cin = 64
    for i, cout in enumerate([64, 128, 256, 512]):
        stride = 1 if i == 0 else 2
        layers += [BasicBlock(cin, cout, stride), BasicBlock(cout, cout)]
        cin = cout
    layers += [nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(512, num_classes)]
    return nn.Sequential(*layers)


def lp_infonce(z1, z2, tau=1.0):
    z3 = torch.roll(z1, 1, 0)
    neg = torch.cdist(z1, z3, p=2.0) ** 2
    pos = ((z1 - z2) ** 2).sum(-1)
    allv = torch.cat([neg, pos.unsqueeze(1)], 1)
    return (pos / tau + torch.logsumexp(-allv / tau, dim=1)).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", type=str,
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "baseline_measured.json"))
    args = ap.parse_args()

    torch.manual_seed(0)
    model = resnet18(10)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x1 = torch.randn(args.batch, 3, 224, 224)
    x2 = torch.randn(args.batch, 3, 224, 224)

    # warmup
    loss = lp_infonce(model(x1), model(x2))
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss = lp_infonce(model(x1), model(x2))
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    pairs_per_sec = args.batch * args.iters / dt

    result = {
        "metric": "reference torch-CPU ResNet18 InfoNCE training pairs/sec",
        "pairs_per_sec": pairs_per_sec,
        "batch": args.batch,
        "iters": args.iters,
        "threads": torch.get_num_threads(),
        "seconds_per_step": dt / args.iters,
        "note": "reference cl-ica 3DIdent config (main_3dident.py:30-36,104) "
                "measured on this machine's CPU; pairs/sec is ~batch-size "
                "independent for CPU-bound convs.",
    }
    with open(os.path.abspath(args.out), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
