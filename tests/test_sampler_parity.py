"""Distributional parity vs the reference's torch samplers.

Draws large samples from both implementations (same parameters,
independent RNG streams) and compares with two-sample KS tests — the
strongest cross-implementation check available given torch and JAX RNG
streams cannot match bitwise (SURVEY.md §7 'hard parts')."""

import os
import sys

import jax
import numpy as np
import pytest
import scipy.stats as sps

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

N_SAMPLES = 8000
ALPHA = 1e-3  # reject only on very strong evidence


@pytest.fixture(scope="module")
def ref_spaces():
    sys.path.insert(0, REF)
    import importlib

    import spaces as ref_spaces_mod

    importlib.reload(ref_spaces_mod)
    yield ref_spaces_mod
    sys.path.remove(REF)


def _ks2(ours, theirs):
    stat, p = sps.ks_2samp(np.asarray(ours).ravel(), np.asarray(theirs).ravel())
    return p


def test_box_truncated_normal_parity(ref_spaces):
    import torch

    from cl_ica_tpu.spaces import NBoxSpace

    torch.manual_seed(0)
    mean_t = torch.full((5,), 0.7)
    theirs = ref_spaces.NBoxSpace(5, -1, 1).normal(mean_t, 0.3, N_SAMPLES)
    ours = NBoxSpace(5, -1, 1).normal(
        jax.random.PRNGKey(0), np.full(5, 0.7, np.float32), 0.3, N_SAMPLES
    )
    for d in range(5):
        assert _ks2(ours[:, d], theirs[:, d].numpy()) > ALPHA


def test_box_truncated_laplace_parity(ref_spaces):
    import torch

    from cl_ica_tpu.spaces import NBoxSpace

    torch.manual_seed(1)
    mean_t = torch.zeros(4)
    theirs = ref_spaces.NBoxSpace(4, -1, 1).laplace(mean_t, 0.2, N_SAMPLES)
    ours = NBoxSpace(4, -1, 1).laplace(
        jax.random.PRNGKey(1), np.zeros(4, np.float32), 0.2, N_SAMPLES
    )
    for d in range(4):
        assert _ks2(ours[:, d], theirs[:, d].numpy()) > ALPHA


def test_sphere_vmf_parity(ref_spaces):
    import torch

    from cl_ica_tpu.spaces import NSphereSpace

    np.random.seed(2)  # reference vMF uses global numpy RNG
    mean = np.zeros(6, dtype=np.float32)
    mean[0] = 1.0
    theirs = ref_spaces.NSphereSpace(6).von_mises_fisher(
        torch.tensor(mean), 10.0, N_SAMPLES
    )
    ours = NSphereSpace(6).von_mises_fisher(
        jax.random.PRNGKey(2), mean, 10.0, N_SAMPLES
    )
    # compare the sufficient statistic: cosine to the mean direction
    assert _ks2(np.asarray(ours[:, 0]), theirs[:, 0].numpy()) > ALPHA
    # and a tangential coordinate
    assert _ks2(np.asarray(ours[:, 3]), theirs[:, 3].numpy()) > ALPHA


def test_generalized_normal_parity(ref_spaces):
    import torch

    from cl_ica_tpu.spaces import NRealSpace

    torch.manual_seed(3)
    theirs = ref_spaces.NRealSpace(3).generalized_normal(
        torch.zeros(3), 0.5, p=3, size=N_SAMPLES
    )
    ours = NRealSpace(3).generalized_normal(
        jax.random.PRNGKey(3), np.zeros(3, np.float32), 0.5, 3.0, N_SAMPLES
    )
    for d in range(3):
        assert _ks2(ours[:, d], theirs[:, d].numpy()) > ALPHA


def test_sphere_uniform_parity(ref_spaces):
    import torch

    from cl_ica_tpu.spaces import NSphereSpace

    torch.manual_seed(4)
    theirs = ref_spaces.NSphereSpace(8).uniform(N_SAMPLES)
    ours = NSphereSpace(8).uniform(jax.random.PRNGKey(4), N_SAMPLES)
    for d in (0, 4, 7):
        assert _ks2(ours[:, d], theirs[:, d].numpy()) > ALPHA
