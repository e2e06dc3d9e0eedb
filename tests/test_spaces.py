"""Sampler tests: distributional/shape/topology properties + jit-ability.

The reference has no tests (SURVEY.md §4); strategy here is moment / KS
checks against closed forms, topology invariants (sphere norm, box
support), seed determinism, and jit compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from cl_ica_tpu.spaces import (
    NBoxSpace,
    NRealSpace,
    NSphereSpace,
    LatentSpace,
    ProductLatentSpace,
    cartesian_to_spherical,
    sample_generalized_normal,
    sample_vmf,
    spherical_to_cartesian,
)

N = 10
SIZE = 4096


def test_real_normal_moments(key):
    space = NRealSpace(N)
    mean = jnp.arange(N, dtype=jnp.float32)
    x = space.normal(key, mean, 2.0, SIZE)
    assert x.shape == (SIZE, N)
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), np.asarray(mean), atol=0.2)
    np.testing.assert_allclose(np.std(np.asarray(x), 0), 2.0, atol=0.2)


def test_real_laplace_ks(key):
    space = NRealSpace(N)
    x = space.laplace(key, jnp.zeros(N), 1.0, SIZE)
    stat, p = sps.kstest(np.asarray(x[:, 0]), "laplace")
    assert p > 0.01


def test_generalized_normal_matches_gennorm(key):
    for p_exp in (1.0, 2.0, 3.0):
        x = sample_generalized_normal(key, 0.0, 1.0, p_exp, (SIZE * 4,))
        stat, p = sps.kstest(np.asarray(x), "gennorm", args=(p_exp,))
        assert p > 0.01, f"p_exp={p_exp}: KS p={p}"


def test_sphere_uniform_on_sphere(key):
    space = NSphereSpace(N)
    x = space.uniform(key, SIZE)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-5
    )
    # each marginal symmetric around 0
    assert abs(float(jnp.mean(x))) < 0.02


def test_sphere_normal_projects(key):
    space = NSphereSpace(N)
    mean = jnp.zeros(N).at[0].set(1.0)
    x = space.normal(key, mean, 0.05, SIZE)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-5)
    # concentrated near mean
    assert float(jnp.mean(x[:, 0])) > 0.9


def test_box_uniform_support(key):
    space = NBoxSpace(N, -1.0, 1.0)
    x = space.uniform(key, SIZE)
    assert float(jnp.min(x)) >= -1.0 and float(jnp.max(x)) <= 1.0
    stat, p = sps.kstest(np.asarray(x[:, 3]), "uniform", args=(-1.0, 2.0))
    assert p > 0.01


def test_box_normal_truncated(key):
    space = NBoxSpace(N, -1.0, 1.0)
    mean = jnp.full((N,), 0.9)
    x = space.normal(key, mean, 0.5, SIZE)
    assert x.shape == (SIZE, N)
    assert float(jnp.min(x)) >= -1.0 and float(jnp.max(x)) <= 1.0
    # matches scipy truncnorm distribution for one dim
    a, b = (-1.0 - 0.9) / 0.5, (1.0 - 0.9) / 0.5
    stat, p = sps.kstest(np.asarray(x[:, 0]), "truncnorm", args=(a, b, 0.9, 0.5))
    assert p > 0.01


def test_box_laplace_truncated_support(key):
    space = NBoxSpace(N, -1.0, 1.0)
    x = space.laplace(key, jnp.zeros(N), 0.1, SIZE)
    assert float(jnp.min(x)) >= -1.0 and float(jnp.max(x)) <= 1.0


def test_vmf_mean_direction_and_norm(key):
    mu = np.zeros(N, dtype=np.float32)
    mu[0] = 1.0
    x = sample_vmf(key, mu, 50.0, SIZE)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-5)
    # strong concentration around mu for kappa=50
    assert float(jnp.mean(x[:, 0])) > 0.7


def test_vmf_resultant_length_matches_theory(key):
    # E[w] = coth(kappa) - 1/kappa in 3-d (mean resultant length A_3(kappa))
    kappa = 4.0
    mu = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    x = sample_vmf(key, mu, kappa, 20000)
    w = np.asarray(x[:, 2])
    expected = 1.0 / np.tanh(kappa) - 1.0 / kappa
    assert abs(w.mean() - expected) < 0.01


def test_vmf_per_row_means(key):
    # distinct mean per row must be respected
    k1, k2 = jax.random.split(key)
    mu = np.asarray(NSphereSpace(N).uniform(k1, 64))
    x = sample_vmf(k2, mu, 100.0, 64)
    cos = np.sum(np.asarray(x) * mu, -1)
    assert np.all(cos > 0.8)


def test_spherical_cartesian_roundtrip(key):
    x = np.asarray(NSphereSpace(5).uniform(key, 128)) * 2.5
    r, phi = cartesian_to_spherical(x)
    x2 = spherical_to_cartesian(r, phi)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)


def test_samplers_jittable(key):
    space = NBoxSpace(N, -1.0, 1.0)
    mean = jnp.zeros(N)

    @jax.jit
    def f(k):
        return space.normal(k, mean, 0.3, 256)

    x = f(key)
    assert x.shape == (256, N)
    sphere = NSphereSpace(N)

    @jax.jit
    def g(k):
        return sphere.von_mises_fisher(k, mean.at[0].set(1.0), 10.0, 256)

    y = g(key)
    assert y.shape == (256, N)


def test_seed_determinism(key):
    space = NSphereSpace(N)
    a = space.uniform(key, 32)
    b = space.uniform(key, 32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latent_space_pair(key):
    space = NSphereSpace(N)
    ls = LatentSpace(
        space,
        sample_marginal=lambda sp, k, size: sp.uniform(k, size),
        sample_conditional=lambda sp, k, z, size: sp.von_mises_fisher(k, z, 20.0, size),
    )
    z, zt = ls.sample_pair(key, 128)
    assert z.shape == zt.shape == (128, N)
    # conditional concentrated around z
    cos = np.sum(np.asarray(z) * np.asarray(zt), -1)
    assert np.mean(cos) > 0.5


def test_product_latent_space(key):
    box = NBoxSpace(3, -1, 1)
    sph = NSphereSpace(4)
    ls = ProductLatentSpace(
        [
            LatentSpace(
                box,
                lambda sp, k, size: sp.uniform(k, size),
                lambda sp, k, z, size: sp.normal(k, z, 0.1, size),
            ),
            LatentSpace(
                sph,
                lambda sp, k, size: sp.uniform(k, size),
                lambda sp, k, z, size: sp.von_mises_fisher(k, z, 20.0, size),
            ),
        ]
    )
    assert ls.dim == 7
    z, zt = ls.sample_pair(key, 64)
    assert z.shape == zt.shape == (64, 7)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(zt[:, 3:]), axis=-1), 1.0, atol=1e-5
    )
    assert float(jnp.max(jnp.abs(zt[:, :3]))) <= 1.0


def test_box_rej_mult_wired(key):
    """--rej-mult (NBoxSpace.rej_mult) draws rej_mult x size candidates
    per rejection iteration; distribution must be unchanged."""
    mean = jnp.full((N,), 0.9)
    x4 = NBoxSpace(N, -1.0, 1.0, rej_mult=4).normal(key, mean, 0.5, SIZE)
    assert x4.shape == (SIZE, N)
    assert float(jnp.min(x4)) >= -1.0 and float(jnp.max(x4)) <= 1.0
    a, b = (-1.0 - 0.9) / 0.5, (1.0 - 0.9) / 0.5
    stat, p = sps.kstest(np.asarray(x4[:, 0]), "truncnorm", args=(a, b, 0.9, 0.5))
    assert p > 0.01
