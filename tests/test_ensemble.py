"""Vmapped multi-seed ensemble == serial runs, seed for seed.

The ensemble factory (train/trainer.py:make_ensemble_synthetic_train_steps)
claims lane i of the stacked TrainState executes the same program as a
serial run seeded like lane i: identical RNG split order, identical
per-seed frozen mixing, vmap's while_loop batching rule freezing
finished rejection-sampler lanes with lax.select. These tests pin that
claim at the factory level (params + loss trajectories) and at the CLI
level (main_mlp --seeds N vs N serial invocations).

Reference anchor: the paper's protocol is multi-seed — the reference
seeds whole runs at /root/reference/main_mlp.py:132-135 and launches
them one by one; the ensemble trains them in lockstep on one chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cl_ica_tpu.losses import LpSimCLRLoss
from cl_ica_tpu.models import construct_invertible_mlp, get_mlp, stack_mixings
from cl_ica_tpu.spaces import LatentSpace, NBoxSpace
from cl_ica_tpu.train import (
    TrainState,
    make_ensemble_synthetic_train_steps,
    make_scanned_synthetic_train_steps,
)

N = 3
BATCH = 64
STEPS = 25
SEEDS = [5, 6]


def _latent_space():
    space = NBoxSpace(N, 0.0, 1.0)
    return LatentSpace(
        space,
        lambda sp, k, size: sp.uniform(k, size),
        lambda sp, k, z, size: sp.laplace(k, z, 0.05, size),
    )


def _setup(seed, f, optimizer):
    g = construct_invertible_mlp(
        n=N, n_layers=2, act_fct="leaky_relu",
        cond_thresh_ratio=0.0, n_iter_cond_thresh=1000,
        rng=np.random.default_rng(seed),
    )
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = f.init(k_init, jnp.zeros((2, N)))
    key, k_train = jax.random.split(key)
    state = TrainState.create(params, optimizer.init(params), k_train)
    return g, state


def test_ensemble_matches_serial_factory_level():
    latent_space = _latent_space()
    loss = LpSimCLRLoss(p=1, tau=1.0, simclr_compatibility_mode=True)
    f = get_mlp(n_in=N, n_out=N, layers=[N * 10, N * 10],
                output_normalization="learnable_box")
    optimizer = optax.adam(1e-3)

    serial_params, serial_losses = [], []
    gs, states = [], []
    for seed in SEEDS:
        g, state = _setup(seed, f, optimizer)
        gs.append(g)
        states.append(state)
        steps = make_scanned_synthetic_train_steps(
            latent_space.sample_pair, g, lambda p, x: f.apply(p, x),
            loss, optimizer, BATCH, n_inner=STEPS, donate=False,
        )
        out_state, metrics = steps(state)
        serial_params.append(out_state.params)
        serial_losses.append(np.asarray(metrics["loss"]))

    weights_stack, mixing_apply = stack_mixings(gs)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    esteps = make_ensemble_synthetic_train_steps(
        latent_space.sample_pair, weights_stack, mixing_apply,
        lambda p, x: f.apply(p, x), loss, optimizer, BATCH,
        n_inner=STEPS, donate=False,
    )
    out_states, emetrics = esteps(stacked)
    eloss = np.asarray(emetrics["loss"])  # (STEPS, S)

    assert eloss.shape == (STEPS, len(SEEDS))
    for i in range(len(SEEDS)):
        np.testing.assert_allclose(
            eloss[:, i], serial_losses[i], rtol=1e-4, atol=1e-5,
            err_msg=f"loss trajectory diverged for seed {SEEDS[i]}",
        )
        lane = jax.tree.map(lambda a: np.asarray(a[i]), out_states.params)
        for e, s in zip(jax.tree.leaves(lane),
                        jax.tree.leaves(serial_params[i])):
            np.testing.assert_allclose(
                e, np.asarray(s), rtol=1e-4, atol=2e-5,
                err_msg=f"params diverged for seed {SEEDS[i]}",
            )


def test_ensemble_step_counter_per_lane():
    latent_space = _latent_space()
    loss = LpSimCLRLoss(p=1, tau=1.0, simclr_compatibility_mode=True)
    f = get_mlp(n_in=N, n_out=N, layers=[N * 10],
                output_normalization=None)
    optimizer = optax.adam(1e-3)
    gs, states = zip(*[_setup(s, f, optimizer) for s in SEEDS])
    weights_stack, mixing_apply = stack_mixings(list(gs))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    esteps = make_ensemble_synthetic_train_steps(
        latent_space.sample_pair, weights_stack, mixing_apply,
        lambda p, x: f.apply(p, x), loss, optimizer, BATCH,
        n_inner=4, donate=False,
    )
    out_states, _ = esteps(stacked)
    np.testing.assert_array_equal(np.asarray(out_states.step),
                                  [4] * len(SEEDS))


def test_cli_seeds_matches_serial_runs(tmp_path):
    """main_mlp --seeds 2 reproduces two serial --seed runs' final
    per-seed scores (same RNG streams end to end)."""
    from cl_ica_tpu.cli import main_mlp

    common = [
        "--space-type", "box", "--n", "3", "--batch-size", "64",
        "--n-steps", "40", "--n-log-steps", "20", "--only-unsupervised",
        "--more-unsupervised", "1", "--c-p", "1", "--p", "1",
        "--box-norm", "--num-eval-batches", "2",
    ]
    serial = []
    for seed in SEEDS:
        lin, perm = main_mlp.main(common + ["--seed", str(seed)])
        serial.append((lin, perm))
    lins, perms = main_mlp.main(
        common + ["--seed", str(SEEDS[0]), "--seeds", str(len(SEEDS))]
    )
    for i in range(len(SEEDS)):
        assert abs(lins[i] - serial[i][0]) < 5e-3, (i, lins, serial)
        assert abs(perms[i] - serial[i][1]) < 5e-3, (i, perms, serial)


def test_cli_seeds_guards():
    from cl_ica_tpu.cli import main_mlp

    with pytest.raises(SystemExit):
        main_mlp.parse_args(["--seeds", "2", "--mesh", "2"])
    with pytest.raises(SystemExit):
        main_mlp.parse_args(["--seeds", "2", "--resume-training"])
