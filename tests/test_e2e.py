"""End-to-end identifiability smoke test (SURVEY.md §4: tiny n, a few
hundred steps must beat the random-encoder MCC baseline)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cl_ica_tpu.evaluation import linear_disentanglement, permutation_disentanglement
from cl_ica_tpu.losses import LpSimCLRLoss
from cl_ica_tpu.models import construct_invertible_mlp, get_mlp
from cl_ica_tpu.spaces import LatentSpace, NSphereSpace
from cl_ica_tpu.train import TrainState, make_scanned_synthetic_train_steps


def test_contrastive_training_recovers_latents():
    n, batch = 3, 512
    space = NSphereSpace(n)
    latent = LatentSpace(
        space,
        sample_marginal=lambda sp, k, size: sp.uniform(k, size),
        sample_conditional=lambda sp, k, z, size: sp.von_mises_fisher(
            k, z, 20.0, size
        ),
    )
    g = construct_invertible_mlp(
        n=n, n_layers=2, n_iter_cond_thresh=500, cond_thresh_ratio=0.0,
        rng=np.random.default_rng(0),
    )
    f = get_mlp(n, n, [n * 10, n * 30, n * 10], output_normalization="fixed_sphere")
    params = f.init(jax.random.PRNGKey(1), jnp.zeros((2, n)))
    loss = LpSimCLRLoss(p=2.0, tau=1.0, simclr_compatibility_mode=True)
    opt = optax.adam(1e-3)
    steps = make_scanned_synthetic_train_steps(
        latent.sample_pair, g, lambda p, x: f.apply(p, x), loss, opt, batch,
        n_inner=100, donate=False,
    )
    state = TrainState.create(params, opt.init(params), jax.random.PRNGKey(2))

    def scores(params):
        z = latent.sample_marginal(jax.random.PRNGKey(99), 2048)
        hz = f.apply(params, g(z))
        (lin, _), _ = linear_disentanglement(z, hz, mode="r2")
        (mcc, _), _ = permutation_disentanglement(
            z, hz, mode="pearson", solver="munkres", rescaling=True
        )
        return lin, mcc

    lin0, mcc0 = scores(state.params)
    for _ in range(4):  # 400 steps
        state, metrics = steps(state)
    lin1, mcc1 = scores(state.params)
    losses = np.asarray(metrics["loss"])

    assert np.all(np.isfinite(losses))
    assert mcc1 > mcc0 + 0.15, f"MCC did not improve: {mcc0:.3f} -> {mcc1:.3f}"
    assert lin1 > lin0, f"linear R2 did not improve: {lin0:.3f} -> {lin1:.3f}"


def test_scanned_steps_chunking_exact():
    """n_inner > MAX_SCAN_LEN splits into sequential device programs with
    bitwise-identical results (the 20k-scan TPU worker fault guard,
    trainer.MAX_SCAN_LEN)."""
    import cl_ica_tpu.train.trainer as trainer_mod

    n, batch = 3, 64
    space = NSphereSpace(n)
    latent = LatentSpace(
        space,
        sample_marginal=lambda sp, k, size: sp.uniform(k, size),
        sample_conditional=lambda sp, k, z, size: sp.von_mises_fisher(
            k, z, 20.0, size
        ),
    )
    g = construct_invertible_mlp(
        n=n, n_layers=2, n_iter_cond_thresh=100, cond_thresh_ratio=0.0,
        rng=np.random.default_rng(0),
    )
    f = get_mlp(n, n, [8, 8], output_normalization="fixed_sphere")
    params = f.init(jax.random.PRNGKey(1), jnp.zeros((2, n)))
    loss = LpSimCLRLoss(p=2.0, tau=1.0, simclr_compatibility_mode=True)
    opt = optax.adam(1e-3)

    def make(n_inner):
        return make_scanned_synthetic_train_steps(
            latent.sample_pair, g, lambda p, x: f.apply(p, x), loss, opt,
            batch, n_inner=n_inner, donate=False,
        )

    state0 = TrainState.create(params, opt.init(params), jax.random.PRNGKey(2))

    ref_fn = make(7)
    state_ref, m_ref = ref_fn(state0)

    orig = trainer_mod.MAX_SCAN_LEN
    trainer_mod.MAX_SCAN_LEN = 3
    try:
        chunked_fn = make(7)  # -> programs of length 3,3,1
    finally:
        trainer_mod.MAX_SCAN_LEN = orig
    state_ch, m_ch = chunked_fn(state0)

    assert m_ch["loss"].shape == (7,)
    np.testing.assert_allclose(
        np.asarray(m_ref["loss"]), np.asarray(m_ch["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(state_ref.params), jax.tree.leaves(state_ch.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert int(state_ch.step) == 7
