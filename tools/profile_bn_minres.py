"""A/B the full bench train step across norm kinds: HLO bytes + time.

Round-3 probe for the minimal-residual BN custom VJP (ops/bn_minres.py).
Per the round-2 Mosaic lessons: check compile().cost_analysis() bytes
BEFORE trusting any wall-clock number. Run on the TPU backend:

    PYTHONPATH=/root/repo python -u tools/profile_bn_minres.py [kinds...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

from cl_ica_tpu.losses import LpSimCLRLoss
from cl_ica_tpu.models import ResNet18
from cl_ica_tpu.train import TrainState

BATCH = 512  # pairs; the forward sees 2*BATCH images


def build(kind: str):
    model = ResNet18(
        num_classes=10, dtype=jnp.bfloat16, norm_kind=kind,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    loss_fn = LpSimCLRLoss(p=2.0, tau=1.0, simclr_compatibility_mode=True)
    opt = optax.adam(1e-4)
    state = TrainState.create(
        params, opt.init(params), jax.random.PRNGKey(1),
        batch_stats=batch_stats,
    )

    def train_step(state):
        key, k1, k2 = jax.random.split(state.key, 3)
        x1 = jax.random.normal(k1, (BATCH, 224, 224, 3), dtype=jnp.bfloat16)
        x2 = x1 + 0.1 * jax.random.normal(
            k2, (BATCH, 224, 224, 3), dtype=jnp.bfloat16
        )
        x = jnp.concatenate([x1, x2], axis=0)

        def objective(params):
            z, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            z1, z2 = z[:BATCH], z[BATCH:]
            z3 = jnp.roll(z1, 1, axis=0)
            total, _, _ = loss_fn(None, None, None, z1, z2, z3)
            return total, mut["batch_stats"]

        (total, new_bs), grads = jax.value_and_grad(
            objective, has_aux=True
        )(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=opt_state, step=state.step + 1,
            key=key, batch_stats=new_bs,
        ), total

    return state, train_step


def main():
    kinds = sys.argv[1:] or ["batch", "fast", "minres"]
    jax.config.update("jax_default_prng_impl", "rbg")
    results = {}
    for kind in kinds:
        state, step = build(kind)
        # one jit wrapper serves both cost_analysis and the timed loop —
        # a second wrapper would recompile (~85 s on the remote service)
        step_jit = jax.jit(step, donate_argnums=(0,))
        compiled = step_jit.lower(state).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gb = ca.get("bytes accessed", float("nan")) / 1e9
        print(f"[{kind}] HLO bytes accessed: {gb:.2f} GB", flush=True)
        state, loss = step_jit(state)
        float(loss)
        state, loss = step_jit(state)
        float(loss)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step_jit(state)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        pps = BATCH / dt
        results[kind] = (gb, dt * 1e3, pps)
        print(f"[{kind}] {dt*1e3:.1f} ms/step  {pps:.0f} pairs/s", flush=True)
        del state, step_jit, compiled

    print("\nkind      GB      ms    pairs/s")
    for k, (gb, ms, pps) in results.items():
        print(f"{k:8s} {gb:6.2f} {ms:7.1f} {pps:8.0f}")


if __name__ == "__main__":
    main()
