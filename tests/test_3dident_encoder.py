"""ThreeDIdentEncoder constraint-head behavior (main_3dident.py:288-371
parity): split heads, box/sphere constraints, debug modes."""

import jax
import jax.numpy as jnp
import numpy as np

from cl_ica_tpu.cli.main_3dident import ThreeDIdentEncoder, build_split_loss

key = jax.random.PRNGKey(0)


def _mk(n=11, na=3, **kw):
    model = ThreeDIdentEncoder(n_latents=n, n_non_angular=na, dummy_mixing=True, **kw)
    params = model.init(key, jnp.zeros((2, n)))
    return model, params


def test_split_head_periodic():
    # default: first na dims unconstrained, remaining on unit sphere
    model, params = _mk()
    out = model.apply(params, jax.random.normal(key, (8, 11)))
    assert out.shape == (8, 11)
    ang = np.asarray(out[:, 3:])
    r = np.linalg.norm(ang, axis=-1)
    np.testing.assert_allclose(r, r[0], rtol=1e-4)  # common learnable radius


def test_box_constraint_head():
    # non-periodic mode: the driver sets n_non_angular == n_latents
    # (setup_latent_space returns n_ang=0, main_3dident.py:240-260)
    model, params = _mk(n=11, na=11, non_periodic=True, box_constraint="fix")
    out = model.apply(params, 100 * jax.random.normal(key, (8, 11)))
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_identity_solution_flattens():
    model = ThreeDIdentEncoder(n_latents=11, n_non_angular=3,
                               identity_solution=True)
    params = model.init(key, jnp.zeros((2, 4, 4, 3)))
    x = jax.random.normal(key, (5, 4, 4, 3))
    out = model.apply(params, x)
    assert out.shape == (5, 48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).reshape(5, -1))


class _Args:
    unsupervised_loss = "l2"
    position_only = False
    non_periodic_rotation_and_color = False
    rotation_and_color_only = False
    rotation_only = False
    color_only = False


def test_split_loss_combines():
    loss = build_split_loss(_Args(), 3)
    z1 = jax.random.normal(key, (16, 11))
    z2 = z1 + 0.05
    z3 = jnp.roll(z1, 1, axis=0)
    total, per_item, comps = loss(z1, z2, z3)
    assert np.isfinite(float(total))
    assert per_item.shape == (16,)
    assert len(comps) == 2  # spherical + nonspherical components


def test_split_loss_subset_modes():
    a = _Args()
    a.position_only = True
    loss = build_split_loss(a, 3)
    z1 = jax.random.normal(key, (8, 3))
    total, _, _ = loss(z1, z1 + 0.1, jnp.roll(z1, 1, 0))
    assert np.isfinite(float(total))


def test_norm_kind_selects_bn_flavor():
    """--norm-kind wires through to the backbone; 'batch' rebuilds the
    pre-r3 flax nn.BatchNorm module naming so old checkpoints load."""
    def param_names(norm_kind):
        model = ThreeDIdentEncoder(
            n_latents=4, n_non_angular=4, non_periodic=True,
            norm_kind=norm_kind,
        )
        v = model.init(key, jnp.zeros((2, 32, 32, 3)), train=False)
        flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        return " ".join(str(p) for p, _ in flat)

    assert "BatchNorm_0" in param_names("batch")
    assert "MinResBN" in param_names("minres")
