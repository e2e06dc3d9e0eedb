"""Profile the 3DIdent ResNet18 InfoNCE train step on the real TPU.

Breaks the step into components and compares dispatch strategies:
  1. per-step dispatch (what bench.py r1 did)
  2. lax.scan over k steps in one device program (amortized dispatch)
  3. forward-only and fwd+bwd timings
and prints the compiled HLO cost analysis (flops) so MXU utilization can
be computed instead of guessed.

Run on the default (TPU) backend:  python -u tools/profile_resnet.py
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

BATCH = 512
N_LATENTS = 10


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)

    model = ResNet18(num_classes=N_LATENTS, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    loss_fn = LpSimCLRLoss(p=2.0, tau=1.0, simclr_compatibility_mode=True)
    opt = optax.adam(1e-4)
    state = TrainState.create(
        params, opt.init(params), jax.random.PRNGKey(1), batch_stats=batch_stats
    )

    x = jax.random.normal(
        jax.random.PRNGKey(2), (2 * BATCH, 224, 224, 3), dtype=jnp.bfloat16
    )

    # --- forward only (2B images) ---
    @jax.jit
    def fwd(params, batch_stats, x):
        z, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return z

    t_fwd = timeit(fwd, state.params, state.batch_stats, x)
    print(f"fwd 2B={2*BATCH}: {t_fwd*1e3:.2f} ms", flush=True)

    # --- fwd+bwd (no optimizer) ---
    def objective(params, batch_stats, x):
        z, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        z1, z2 = z[:BATCH], z[BATCH:]
        z3 = jnp.roll(z1, 1, axis=0)
        total, _, _ = loss_fn(None, None, None, z1, z2, z3)
        return total

    grad_fn = jax.jit(jax.grad(objective))
    t_bwd = timeit(grad_fn, state.params, state.batch_stats, x)
    print(f"fwd+bwd: {t_bwd*1e3:.2f} ms", flush=True)

    lowered = jax.jit(jax.grad(objective)).lower(state.params, state.batch_stats, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops")
    if flops:
        print(f"HLO flops(fwd+bwd): {flops/1e12:.2f} TF -> "
              f"{flops/t_bwd/1e12:.0f} TF/s achieved", flush=True)
    print({k: v for k, v in cost.items()
           if k in ("flops", "bytes accessed", "transcendentals")}, flush=True)

    # --- full train step, per-step dispatch ---
    def train_step(state):
        key, k1, k2 = jax.random.split(state.key, 3)
        x1 = jax.random.normal(k1, (BATCH, 224, 224, 3), dtype=jnp.bfloat16)
        x2 = x1 + 0.1 * jax.random.normal(k2, (BATCH, 224, 224, 3), dtype=jnp.bfloat16)
        xx = jnp.concatenate([x1, x2], axis=0)

        def obj(params):
            z, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xx, train=True, mutable=["batch_stats"],
            )
            z1, z2 = z[:BATCH], z[BATCH:]
            z3 = jnp.roll(z1, 1, axis=0)
            total, _, _ = loss_fn(None, None, None, z1, z2, z3)
            return total, mut["batch_stats"]

        (total, new_bs), grads = jax.value_and_grad(obj, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=opt_state, step=state.step + 1,
            key=key, batch_stats=new_bs,
        ), total

    step_jit = jax.jit(train_step, donate_argnums=(0,))
    state, loss = step_jit(state)
    float(loss)
    state, loss = step_jit(state)
    float(loss)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step_jit(state)
    float(loss)
    t_step = (time.perf_counter() - t0) / iters
    print(f"train step (per-step dispatch): {t_step*1e3:.2f} ms "
          f"-> {BATCH/t_step:.0f} pairs/s", flush=True)

    # --- full train step, scanned k steps per dispatch ---
    K = 10

    def scanned(state):
        def body(s, _):
            s, l = train_step(s)
            return s, l
        return jax.lax.scan(body, state, None, length=K)

    scan_jit = jax.jit(scanned, donate_argnums=(0,))
    state, losses = scan_jit(state)
    float(losses[-1])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        state, losses = scan_jit(state)
    float(losses[-1])
    t_scan = (time.perf_counter() - t0) / (reps * K)
    print(f"train step (scan x{K}): {t_scan*1e3:.2f} ms "
          f"-> {BATCH/t_scan:.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
