"""Jitted train-step factories + throughput telemetry.

One XLA program per step. For the synthetic (MLP-mixing) path the
latent sampling, frozen mixing, encoder, loss, and Adam update all fuse
into a single compiled step — there is no host<->device boundary at all
(the reference crosses it at least twice per step: host sampling at
main_mlp.py:328 and .to(device) at :260-261, plus a CPU detour for vMF).

Negatives follow the reference trick z3_rec = roll(z1_rec, 1)
(main_mlp.py:266,272; main_3dident.py:488; solver.py:66).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..utils.debug import checkify_wrap, debug_enabled, nan_check
from .state import TrainState

# Maximum lax.scan trip count compiled into ONE device program. A single
# 20 000-step scan crashed the v5e TPU worker with a kernel fault during
# round-1 bring-up; 10 000-step programs are proven stable (EXPERIMENTS.md,
# CLAUDE.md #7). Longer requests are transparently split into sequential
# <=limit device calls with identical math (the scan carry is the full
# TrainState, so chunk boundaries are exact step boundaries). Override via
# CL_ICA_TPU_MAX_SCAN_LEN.
MAX_SCAN_LEN = int(os.environ.get("CL_ICA_TPU_MAX_SCAN_LEN", "10000"))


def make_chunked_steps(jit_scan, n_inner: int, max_len: int):
    """Compose jitted scan chunks into one n_inner-step callable.

    jit_scan(length) must return a jitted fn(state) -> (state, metrics)
    whose metrics carry a leading (length,) axis. Lengths over max_len
    are split into sequential device calls (MAX_SCAN_LEN's
    backend-stability rationale); metrics are concatenated so callers
    see a single (n_inner,) contract. Shared by the single-device and
    mesh-sharded scanned factories."""
    if n_inner <= max_len:
        return jit_scan(n_inner)

    n_full, rem = divmod(n_inner, max_len)
    chunk_fns = {max_len: jit_scan(max_len)}
    if rem:
        chunk_fns[rem] = jit_scan(rem)
    lengths = [max_len] * n_full + ([rem] if rem else [])

    def steps_chunked(state):
        metric_chunks = []
        for length in lengths:
            state, m = chunk_fns[length](state)
            metric_chunks.append(m)
        metrics = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *metric_chunks
        )
        return state, metrics

    return steps_chunked


def _jit_step(fn, donate: bool):
    """jit a step; under CL_ICA_TPU_DEBUG=1 additionally functionalize
    the nan_check guards via checkify so non-finite losses/grads raise
    (the reference asserts eagerly at losses.py:214,233 — impossible
    under jit). Donation is disabled in debug mode (checkify keeps the
    error state alive across the call)."""
    if debug_enabled():
        return checkify_wrap(jax.jit(fn))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_synthetic_train_step(
    sample_pair: Callable,  # (key, size) -> (z1, z2)
    mixing: Callable,  # g: (B, n) -> (B, d)
    apply_encoder: Callable,  # (params, x) -> (B, n)
    loss_fn,  # CLLoss-protocol callable
    optimizer: optax.GradientTransformation,
    batch_size: int,
    supervised: bool = False,
    donate: bool = True,
):
    """Fully-fused step for on-the-fly synthetic data (main_mlp path).

    supervised=True swaps the contrastive loss for MSE against the
    ground-truth latents (the reference's upper-bound baseline,
    main_mlp.py:274-275).
    """

    def step(state: TrainState) -> Tuple[TrainState, dict]:
        key, k_data = jax.random.split(state.key)
        z1, z2 = sample_pair(k_data, batch_size)
        z3 = jnp.roll(z1, 1, axis=0)

        def objective(params):
            h = lambda z: apply_encoder(params, mixing(z))
            z1_rec = h(z1)
            z2_rec = h(z2)
            z3_rec = jnp.roll(z1_rec, 1, axis=0)
            if supervised:
                total = jnp.mean((z1_rec - z1) ** 2)
                return total, (total, total)
            total, _, comps = loss_fn(z1, z2, z3, z1_rec, z2_rec, z3_rec)
            return total, (comps[0], comps[1])

        (total, (pos, neg)), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        total = nan_check(total, "loss")
        grads = jax.tree.map(lambda g: nan_check(g, "grads"), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        metrics = {"loss": total, "loss_pos": pos, "loss_neg": neg}
        return new_state, metrics

    return _jit_step(step, donate)


def make_scanned_synthetic_train_steps(
    sample_pair: Callable,
    mixing: Callable,
    apply_encoder: Callable,
    loss_fn,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    n_inner: int,
    supervised: bool = False,
    donate: bool = True,
):
    """n_inner fused training steps per device call via lax.scan.

    The synthetic step is ~100 µs of compute at n=10 — per-step Python
    dispatch (host round-trip) dominates wall time by 10-100x. Scanning
    n_inner steps (naturally = the eval interval n_log_steps) amortizes
    dispatch to one call per eval window. Returns
    step(state) -> (state, metrics) where metrics entries have a leading
    (n_inner,) axis (losses of every inner step, for the reference's
    per-step loss traces).

    n_inner > MAX_SCAN_LEN is split into sequential device calls of at
    most MAX_SCAN_LEN scanned steps each (see MAX_SCAN_LEN's docstring
    for the backend-stability rationale); results are concatenated, so
    callers see the same contract."""

    def one_step(state: TrainState, _):
        key, k_data = jax.random.split(state.key)
        z1, z2 = sample_pair(k_data, batch_size)
        z3 = jnp.roll(z1, 1, axis=0)

        def objective(params):
            h = lambda z: apply_encoder(params, mixing(z))
            z1_rec = h(z1)
            z2_rec = h(z2)
            z3_rec = jnp.roll(z1_rec, 1, axis=0)
            if supervised:
                total = jnp.mean((z1_rec - z1) ** 2)
                return total, (total, total)
            total, _, comps = loss_fn(z1, z2, z3, z1_rec, z2_rec, z3_rec)
            return total, (comps[0], comps[1])

        (total, (pos, neg)), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        total = nan_check(total, "loss")
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return new_state, {"loss": total, "loss_pos": pos, "loss_neg": neg}

    def jit_scan(length):
        return _jit_step(
            lambda s: jax.lax.scan(one_step, s, None, length=length), donate
        )

    # snapshot: the limit at factory time governs
    return make_chunked_steps(jit_scan, n_inner, MAX_SCAN_LEN)


def make_ensemble_synthetic_train_steps(
    sample_pair: Callable,
    mixing_weights,  # pytree stacked over a leading seed axis S
    mixing_apply: Callable,  # (weights_for_one_seed, z) -> x
    apply_encoder: Callable,
    loss_fn,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    n_inner: int,
    supervised: bool = False,
    donate: bool = True,
):
    """Train S independent seeds in lockstep: vmap over the TrainState.

    The MLP-mixing experiment is latency/HBM-bound, not compute-bound
    (13% of the matmul ceiling, EXPERIMENTS r3), so batching S seeds'
    parameters, optimizer states, RNG streams AND their per-seed frozen
    mixings through one vmapped step trains S runs for roughly the wall
    of one. The paper's protocol is itself multi-seed (the reference
    seeds whole runs at main_mlp.py:132-135 and launches them serially);
    this factory makes the seed axis a device axis instead.

    Every leaf of the TrainState (params, opt_state, step, key) and of
    mixing_weights carries a leading (S,) axis. Per-seed RNG streams are
    split inside the vmapped step exactly as the single-seed factories
    do, so each lane's trajectory is the same program as a serial run
    with that lane's seed (vmap's batching rule for the rejection /
    vMF while_loops freezes finished lanes with lax.select, preserving
    per-lane sampling streams bit-for-bit). Verified against serial
    runs in tests/test_ensemble.py.

    Returns step(states) -> (states, metrics) with metrics of shape
    (n_inner, S)."""

    def one_step(state: TrainState, weights):
        key, k_data = jax.random.split(state.key)
        z1, z2 = sample_pair(k_data, batch_size)
        z3 = jnp.roll(z1, 1, axis=0)

        def objective(params):
            h = lambda z: apply_encoder(params, mixing_apply(weights, z))
            z1_rec = h(z1)
            z2_rec = h(z2)
            z3_rec = jnp.roll(z1_rec, 1, axis=0)
            if supervised:
                total = jnp.mean((z1_rec - z1) ** 2)
                return total, (total, total)
            total, _, comps = loss_fn(z1, z2, z3, z1_rec, z2_rec, z3_rec)
            return total, (comps[0], comps[1])

        (total, (pos, neg)), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        total = nan_check(total, "loss")
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return new_state, {"loss": total, "loss_pos": pos, "loss_neg": neg}

    vstep = jax.vmap(one_step)

    def scan_step(states, _):
        return vstep(states, mixing_weights)

    def jit_scan(length):
        return _jit_step(
            lambda s: jax.lax.scan(scan_step, s, None, length=length), donate
        )

    return make_chunked_steps(jit_scan, n_inner, MAX_SCAN_LEN)


def make_data_train_step(
    apply_encoder: Callable,  # (params, batch_stats, x, train) -> (z, new_batch_stats)
    loss_fn,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Step for host-fed image batches (3DIdent / KITTI paths).

    batch = (x1, x2[, z1, z2]): two views; negatives are rolled from
    x1's encodings as in the reference. Handles BatchNorm mutation
    (ResNet) via batch_stats threading.
    """

    def step(state: TrainState, x1, x2) -> Tuple[TrainState, dict]:
        b = x1.shape[0]

        def objective(params):
            # both views in one 2B forward — keeps the MXU fed (1.5x over
            # two sequential passes for ResNet18/224 on v5e) and computes
            # BatchNorm statistics over the combined views once
            z, bs = apply_encoder(
                params, state.batch_stats, jnp.concatenate([x1, x2], axis=0), True
            )
            z1_rec, z2_rec = z[:b], z[b:]
            z3_rec = jnp.roll(z1_rec, 1, axis=0)
            total, _, comps = loss_fn(None, None, None, z1_rec, z2_rec, z3_rec)
            return total, (comps[0], comps[1], bs)

        (total, (pos, neg, batch_stats)), grads = jax.value_and_grad(
            objective, has_aux=True
        )(state.params)
        total = nan_check(total, "loss")
        grads = jax.tree.map(lambda g: nan_check(g, "grads"), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            batch_stats=batch_stats,
        )
        return new_state, {"loss": total, "loss_pos": pos, "loss_neg": neg}

    return _jit_step(step, donate)


class Throughput:
    """pairs/sec telemetry (the BASELINE.json metric). Call update(n)
    after each step completes; read .pairs_per_sec."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.count = 0
        self.pairs = 0
        self.t0 = None

    def update(self, n_pairs: int):
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
        elif self.count > self.warmup:
            self.pairs += n_pairs

    @property
    def pairs_per_sec(self) -> Optional[float]:
        if self.t0 is None or self.pairs == 0:
            return None
        return self.pairs / (time.perf_counter() - self.t0)
