"""Coupling-flow tests: exact invertibility, GIN volume preservation,
identity init, trainability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_ica_tpu.models.flows import (
    CouplingFlow,
    construct_invertible_flow,
    get_flow,
)

key = jax.random.PRNGKey(0)


@pytest.mark.parametrize("coupling", ["gin", "glow"])
@pytest.mark.parametrize("n", [4, 7])
def test_flow_invertible(coupling, n):
    flow = get_flow(n, n, coupling_block=coupling, num_nodes=4)
    params = flow.init(key, jnp.zeros((2, n)))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, n))
    y, logdet = flow.apply(params, x, method=CouplingFlow.forward)
    assert y.shape == x.shape and logdet.shape == (16,)
    x_rec = flow.apply(params, y, method=CouplingFlow.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4,
                               atol=1e-5)


def test_gin_volume_preserving():
    flow = get_flow(6, 6, coupling_block="gin", num_nodes=3)
    params = flow.init(key, jnp.zeros((2, 6)))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
    _, logdet = flow.apply(params, x, method=CouplingFlow.forward)
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-5)
    # verify against autodiff jacobian determinant
    f = lambda v: flow.apply(params, v[None, :])[0]
    jac = jax.vmap(jax.jacfwd(f))(x)
    np.testing.assert_allclose(
        np.abs(np.linalg.det(np.asarray(jac))), 1.0, rtol=1e-4
    )


def test_glow_logdet_matches_jacobian():
    flow = get_flow(4, 4, coupling_block="glow", num_nodes=2)
    params = flow.init(key, jnp.zeros((2, 4)))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    _, logdet = flow.apply(params, x, method=CouplingFlow.forward)
    f = lambda v: flow.apply(params, v[None, :])[0]
    jac = jax.vmap(jax.jacfwd(f))(x)
    np.testing.assert_allclose(
        np.asarray(logdet),
        np.log(np.abs(np.linalg.det(np.asarray(jac)))),
        rtol=1e-3, atol=1e-4,
    )


def test_identity_init():
    flow = get_flow(6, 6, init_identity=True, num_nodes=4)
    params = flow.init(key, jnp.zeros((2, 6)))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
    y = flow.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_frozen_flow_mixing():
    g = construct_invertible_flow(5, key=key)
    x = jax.random.normal(jax.random.PRNGKey(3), (10, 5))
    y = jax.jit(g)(x)
    assert y.shape == (10, 5)
    x_rec = g.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4,
                               atol=1e-5)


def test_get_flow_requires_square():
    with pytest.raises(AssertionError):
        get_flow(4, 5)
