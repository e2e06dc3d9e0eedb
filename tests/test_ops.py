"""Pallas kernel + k-NN op tests (interpret mode on CPU; the jnp loss is
the oracle, per SURVEY.md §7 step 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_ica_tpu.ops import fused_neg_lse, l2_topk
from cl_ica_tpu.losses import pairwise_lp_distance

rng = np.random.default_rng(0)


def _lse_oracle(z1, z3, p, tau):
    d = np.sum(np.abs(z1[:, None, :] - z3[None, :, :]) ** p, axis=-1)
    x = -d / tau
    m = x.max(1, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(1, keepdims=True)))[:, 0]


@pytest.mark.parametrize("p", [1.0, 2.0, 3.0])
@pytest.mark.parametrize("b", [64, 96])
def test_fused_lse_matches_oracle(p, b):
    z1 = rng.normal(size=(b, 10)).astype(np.float32)
    z3 = np.roll(z1, 1, axis=0) + 0.01
    out = fused_neg_lse(jnp.asarray(z1), jnp.asarray(z3), p, 1.0, 32, True)
    exp = _lse_oracle(z1, z3, p, 1.0)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_fused_lse_nondivisible_padding():
    # b=50 with block=32 exercises the column mask
    z1 = rng.normal(size=(50, 4)).astype(np.float32)
    z3 = rng.normal(size=(50, 4)).astype(np.float32)
    out = fused_neg_lse(jnp.asarray(z1), jnp.asarray(z3), 2.0, 0.7, 32, True)
    exp = _lse_oracle(z1, z3, 2.0, 0.7)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("p", [1.0, 2.0, 3.0])
def test_fused_lse_grads_match_jnp(p):
    z1 = rng.normal(size=(64, 6)).astype(np.float32)
    z3 = (rng.normal(size=(64, 6)) * 0.9).astype(np.float32)
    tau = 1.3

    def loss_pallas(a, b):
        return jnp.sum(fused_neg_lse(a, b, p, tau, 32, True) * jnp.arange(64.0))

    def loss_jnp(a, b):
        d = pairwise_lp_distance(a, b, p, pow_=True, block_size=None,
                                 precision="highest")
        lse = jax.scipy.special.logsumexp(-d / tau, axis=1)
        return jnp.sum(lse * jnp.arange(64.0))

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z3))
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z3))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)


def test_l2_topk_exact():
    table = rng.normal(size=(1000, 10)).astype(np.float32)
    q = rng.normal(size=(37, 10)).astype(np.float32)
    idx, d = l2_topk(jnp.asarray(table), jnp.asarray(q), 3)
    # numpy oracle
    full = ((q[:, None, :] - table[None, :, :]) ** 2).sum(-1)
    exp_idx = np.argsort(full, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(full, exp_idx, 1), rtol=1e-3, atol=1e-3
    )


def test_l2_topk_blocked_matches_unblocked():
    table = rng.normal(size=(500, 8)).astype(np.float32)
    q = rng.normal(size=(256, 8)).astype(np.float32)
    i1, d1 = l2_topk(jnp.asarray(table), jnp.asarray(q), 2, 64)
    i2, d2 = l2_topk(jnp.asarray(table), jnp.asarray(q), 2, 1024)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def _dot_lse_oracle(z1, z3, tau):
    x = (z1 @ z3.T) / tau
    m = x.max(1, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(1, keepdims=True)))[:, 0]


@pytest.mark.parametrize("b", [64, 50])
def test_fused_dot_lse_matches_oracle(b):
    from cl_ica_tpu.ops import fused_dot_lse

    z1 = rng.normal(size=(b, 12)).astype(np.float32)
    z3 = rng.normal(size=(b, 12)).astype(np.float32)
    out = fused_dot_lse(jnp.asarray(z1), jnp.asarray(z3), 0.5, 32, True)
    np.testing.assert_allclose(
        np.asarray(out), _dot_lse_oracle(z1, z3, 0.5), rtol=1e-4, atol=1e-5
    )


def test_fused_dot_lse_grads_match_jnp():
    from cl_ica_tpu.ops import fused_dot_lse
    import jax.scipy.special as jsp

    z1 = rng.normal(size=(64, 8)).astype(np.float32)
    z3 = rng.normal(size=(64, 8)).astype(np.float32)
    tau = 0.7
    w = jnp.arange(64.0)

    def loss_pallas(a, b):
        return jnp.sum(fused_dot_lse(a, b, tau, 32, True) * w)

    def loss_jnp(a, b):
        return jnp.sum(jsp.logsumexp((a @ b.T) / tau, axis=1) * w)

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z3))
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z3))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)
