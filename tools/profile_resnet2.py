"""Diagnostic sweep for the ResNet18 train-step bottleneck (round 2).

Variants measured (fwd+bwd via jax.grad, 2B images in one forward):
  - batch scaling (512/1024 pairs)
  - BatchNorm cost: BN vs no-norm (diagnostic only; parity keeps BN)
  - remat'ed blocks (activation traffic trade)
Each prints ms + achieved TF/s + bytes accessed from HLO cost analysis.

Run on the TPU backend: python -u tools/profile_resnet2.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cl_ica_tpu.losses import LpSimCLRLoss
from cl_ica_tpu.models import ResNet18
from cl_ica_tpu.models.resnet import ResNet, BasicBlock

loss_fn = LpSimCLRLoss(p=2.0, tau=1.0, simclr_compatibility_mode=True)


def measure(tag, model, batch, iters=8):
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    has_bn = bool(batch_stats)
    x = jax.random.normal(
        jax.random.PRNGKey(2), (2 * batch, 224, 224, 3), dtype=jnp.bfloat16
    )

    def objective(params, x):
        if has_bn:
            z, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
        else:
            z = model.apply({"params": params}, x, train=True)
        z1, z2 = z[:batch], z[batch:]
        z3 = jnp.roll(z1, 1, axis=0)
        total, _, _ = loss_fn(None, None, None, z1, z2, z3)
        return total

    grad_fn = jax.jit(jax.grad(objective))
    g = grad_fn(params, x)
    float(jnp.sum(jax.tree.leaves(g)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        g = grad_fn(params, x)
    float(jnp.sum(jax.tree.leaves(g)[0]))
    dt = (time.perf_counter() - t0) / iters

    cost = grad_fn.lower(params, x).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = cost.get("flops", 0)
    by = cost.get("bytes accessed", 0)
    print(
        f"{tag:34s} batch={batch:5d}  {dt*1e3:7.2f} ms  "
        f"{fl/dt/1e12:5.0f} TF/s  {by/1e9:6.1f} GB  {by/dt/1e9:4.0f} GB/s  "
        f"{batch/dt:6.0f} pairs/s",
        flush=True,
    )
    return dt


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)

    # baseline bf16 BN
    measure("rn18 bf16 BN", ResNet18(num_classes=10, dtype=jnp.bfloat16), 512)
    # batch scaling
    measure("rn18 bf16 BN", ResNet18(num_classes=10, dtype=jnp.bfloat16), 1024)
    # no-norm diagnostic (removes BN stats + saved fp32 activations)
    nonorm = partial(
        ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock, norm_kind="none"
    )
    try:
        measure("rn18 bf16 no-norm", nonorm(num_classes=10, dtype=jnp.bfloat16), 512)
    except Exception as e:
        print("no-norm variant unavailable:", e, flush=True)
    # remat
    try:
        measure(
            "rn18 bf16 BN remat",
            ResNet18(num_classes=10, dtype=jnp.bfloat16, remat=True),
            512,
        )
    except Exception as e:
        print("remat variant unavailable:", e, flush=True)


if __name__ == "__main__":
    main()
