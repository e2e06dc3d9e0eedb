"""Benchmark: 3DIdent ResNet InfoNCE training throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}

Config matches the reference 3DIdent experiment (main_3dident.py:
30-36,104): ResNet-18 encoder, batch 512, 224x224 RGB, Lp-InfoNCE with
rolled negatives, Adam. The full train step (fwd+bwd+update, BatchNorm
stats threading) runs as one jitted program; images are synthesized
on-device so the benchmark isolates the training compute path.
vs_baseline divides by the reference's torch-CPU pairs/sec measured on
this machine by tools/measure_torch_baseline.py (the repo publishes no
numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    # rbg PRNG: ~6% faster on-device image synthesis vs threefry (the
    # real pipeline feeds host images; bench keeps RNG for isolation)
    jax.config.update("jax_default_prng_impl", "rbg")

    from cl_ica_tpu.losses import LpSimCLRLoss
    from cl_ica_tpu.models import ResNet18
    from cl_ica_tpu.train import TrainState

    batch = 512
    n_latents = 10
    steps = 20

    # CL_ICA_BENCH_STEM=fused selects the fused Pallas BN+ReLU+maxpool
    # stem (ops/stem_pallas.py; same math as norm_kind='fast').
    # Default 'minres' (ops/bn_minres.py): torch-parity BN semantics
    # with a minimal-residual custom VJP — byte-equal to flax BN on
    # this net (EXPERIMENTS r3 ledger: the step is at the HBM floor).
    fused = os.environ.get("CL_ICA_BENCH_STEM", "") == "fused"
    # CL_ICA_BENCH_NORM overrides the BN flavor (e.g. 'minres8' = the
    # sub-bf16 float8-residual variant, ops/bn_minres8.py). Validated
    # loudly: a typo silently benchmarking flax nn.BatchNorm would
    # corrupt numbers headed for EXPERIMENTS.md.
    norm_kind = os.environ.get(
        "CL_ICA_BENCH_NORM", "fast" if fused else "minres"
    )
    if norm_kind not in ("minres", "minres8", "fast", "batch"):
        raise SystemExit(f"CL_ICA_BENCH_NORM={norm_kind!r}: unknown kind")
    if fused and norm_kind != "fast":
        raise SystemExit(
            "CL_ICA_BENCH_STEM=fused forces norm_kind='fast' throughout "
            f"the backbone; unset CL_ICA_BENCH_NORM={norm_kind!r}"
        )
    model = ResNet18(
        num_classes=n_latents,
        dtype=jnp.bfloat16,
        norm_kind=norm_kind,
        fused_stem_pool=fused,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    loss_fn = LpSimCLRLoss(p=2.0, tau=1.0, simclr_compatibility_mode=True)
    opt = optax.adam(1e-4)
    state = TrainState.create(
        params, opt.init(params), jax.random.PRNGKey(1), batch_stats=batch_stats
    )

    def train_step(state):
        key, k1, k2 = jax.random.split(state.key, 3)
        # on-device synthetic views (bench isolates the training path)
        x1 = jax.random.normal(k1, (batch, 224, 224, 3), dtype=jnp.bfloat16)
        x2 = x1 + 0.1 * jax.random.normal(k2, (batch, 224, 224, 3), dtype=jnp.bfloat16)
        # both views in ONE forward: 2B-batch convs keep the MXU fed
        # (1.5x over two sequential B-batch passes on v5e)
        x = jnp.concatenate([x1, x2], axis=0)

        def objective(params):
            z, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            z1, z2 = z[:batch], z[batch:]
            z3 = jnp.roll(z1, 1, axis=0)
            total, _, _ = loss_fn(None, None, None, z1, z2, z3)
            return total, mut["batch_stats"]

        (total, new_bs), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=opt_state, step=state.step + 1,
            key=key, batch_stats=new_bs,
        ), total

    step_jit = jax.jit(train_step, donate_argnums=(0,))

    # compile + warmup. NOTE: sync via float() value fetch — on this
    # remote-dispatch backend block_until_ready() returns before
    # execution finishes, which would overstate throughput ~300x.
    state, loss = step_jit(state)
    float(loss)
    state, loss = step_jit(state)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step_jit(state)
    float(loss)  # final loss depends on all `steps` updates
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * steps / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            ref = json.load(fh)
        vs_baseline = pairs_per_sec / ref["pairs_per_sec"]

    print(
        json.dumps(
            {
                "metric": "3DIdent ResNet18 InfoNCE training throughput "
                          f"(batch {batch}, 224x224, full train step)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
