"""main_mlp configuration-grid coverage: every marginal/conditional
branch builds and samples (the reference's m-p/c-p dispatch table,
main_mlp.py:148-189)."""

import types

import jax
import numpy as np
import pytest

from cl_ica_tpu.cli.main_mlp import build_latent_space


def _args(**kw):
    base = dict(
        space_type="box", n=4, box_min=0.0, box_max=1.0, sphere_r=1.0,
        m_p=0, c_p=2, m_param=1.0, c_param=0.05,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.parametrize("space_type", ["box", "sphere", "unbounded"])
@pytest.mark.parametrize("m_p", [0, 1, 2, 3])
@pytest.mark.parametrize("c_p", [1, 2, 3])
def test_marginal_conditional_grid(space_type, m_p, c_p, key):
    if space_type == "unbounded" and m_p == 0:
        pytest.skip("uniform marginal undefined on R^n (reference parity)")
    ls = build_latent_space(_args(space_type=space_type, m_p=m_p, c_p=c_p))
    z, zt = jax.jit(lambda k: ls.sample_pair(k, 32))(key)
    assert z.shape == zt.shape == (32, 4)
    assert np.all(np.isfinite(np.asarray(z)))
    assert np.all(np.isfinite(np.asarray(zt)))
    if space_type == "box":
        assert float(z.min()) >= 0.0 and float(z.max()) <= 1.0
        assert float(zt.min()) >= 0.0 and float(zt.max()) <= 1.0
    elif space_type == "sphere":
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-5
        )


def test_vmf_conditional_sphere(key):
    ls = build_latent_space(_args(space_type="sphere", c_p=0, c_param=20.0))
    z, zt = ls.sample_pair(key, 64)
    cos = np.sum(np.asarray(z) * np.asarray(zt), -1)
    assert cos.mean() > 0.5  # concentrated conditional


def test_uniform_marginal_unbounded_raises(key):
    ls = build_latent_space(_args(space_type="unbounded", m_p=0))
    with pytest.raises(NotImplementedError):
        ls.sample_marginal(key, 8)
