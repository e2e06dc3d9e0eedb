"""Minimal-residual BN custom VJPs (ops/bn_minres.py, ops/pool_minres.py).

Oracle: the plain jnp composition with FastBatchNorm math (torch
BatchNorm2d training semantics, /root/reference/main_3dident.py:288-385)
differentiated by ordinary autodiff. The custom VJPs must match the
composition's value and gradients; pool tie-handling must match XLA's
SelectAndScatter / torch MaxPool2d first-wins order.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from cl_ica_tpu.ops import bn_minres, pool_minres

EPS = 1e-5


def _data(seed, n=3, h=8, w=8, c=5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)) * 2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.4 * rng.normal(size=(c,)), jnp.float32)
    bias = jnp.asarray(0.3 * rng.normal(size=(c,)), jnp.float32)
    return x, res, scale, bias


def _ref_bn(x, scale, bias):
    mean, var = bn_minres._channel_stats(x)
    a, b = bn_minres._affine(
        scale, bias, mean, jax.lax.rsqrt(var + EPS), x.dtype
    )
    return x * a + b, mean, var


def _loss_through(fn):
    # nonlinear readout so every gradient component is exercised
    return lambda *args: jnp.sum(jnp.sin(fn(*args)))


@pytest.mark.parametrize("shape", [(3, 8, 8, 5), (2, 6, 10, 4)])
def test_bn_relu_matches_composition(shape):
    x, _, scale, bias = _data(0, *shape)
    y, mean, var = bn_minres.bn_relu(x, scale, bias, EPS)
    zr, rmean, rvar = _ref_bn(x, scale, bias)
    np.testing.assert_allclose(y, jnp.maximum(zr, 0), atol=1e-6)
    np.testing.assert_allclose(mean, rmean, atol=1e-7)
    np.testing.assert_allclose(var, rvar, atol=1e-7)

    ours = _loss_through(lambda *a: bn_minres.bn_relu(*a, EPS)[0])
    ref = _loss_through(lambda *a: jnp.maximum(_ref_bn(*a)[0], 0))
    g1 = jax.grad(ours, (0, 1, 2))(x, scale, bias)
    g2 = jax.grad(ref, (0, 1, 2))(x, scale, bias)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(u, v, atol=2e-5)


def test_bn_add_relu_matches_composition():
    x, res, scale, bias = _data(1)
    y, _, _ = bn_minres.bn_add_relu(x, res, scale, bias, EPS)
    ref_y = jnp.maximum(_ref_bn(x, scale, bias)[0] + res, 0)
    np.testing.assert_allclose(y, ref_y, atol=1e-6)

    ours = _loss_through(lambda *a: bn_minres.bn_add_relu(*a, EPS)[0])
    ref = _loss_through(
        lambda x, r, s, b: jnp.maximum(_ref_bn(x, s, b)[0] + r, 0)
    )
    g1 = jax.grad(ours, (0, 1, 2, 3))(x, res, scale, bias)
    g2 = jax.grad(ref, (0, 1, 2, 3))(x, res, scale, bias)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(u, v, atol=2e-5)


def test_bn_only_matches_composition():
    x, _, scale, bias = _data(2)
    y, _, _ = bn_minres.bn_only(x, scale, bias, EPS)
    np.testing.assert_allclose(y, _ref_bn(x, scale, bias)[0], atol=1e-6)
    ours = _loss_through(lambda *a: bn_minres.bn_only(*a, EPS)[0])
    ref = _loss_through(lambda *a: _ref_bn(*a)[0])
    g1 = jax.grad(ours, (0, 1, 2))(x, scale, bias)
    g2 = jax.grad(ref, (0, 1, 2))(x, scale, bias)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(u, v, atol=2e-5)


def test_stats_outputs_carry_no_gradient():
    # the mean/var outputs are declared non-differentiable: a loss
    # built on them must see zero gradient, not garbage
    x, _, scale, bias = _data(3)
    g = jax.grad(lambda x: jnp.sum(bn_minres.bn_relu(x, scale, bias, EPS)[1]))(x)
    np.testing.assert_allclose(g, jnp.zeros_like(g))


@pytest.mark.parametrize("shape", [(3, 8, 8, 4), (2, 12, 16, 5), (1, 4, 4, 1)])
def test_bn_relu_pool_matches_composition(shape):
    x, _, scale, bias = _data(4, *shape)

    def ref(x, scale, bias):
        z = jnp.maximum(_ref_bn(x, scale, bias)[0], 0)
        return nn.max_pool(z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    p, mean, var = pool_minres.bn_relu_pool(x, scale, bias, EPS)
    np.testing.assert_allclose(p, ref(x, scale, bias), atol=1e-6)
    rmean, rvar = bn_minres._channel_stats(x)
    np.testing.assert_allclose(mean, rmean, atol=1e-7)
    np.testing.assert_allclose(var, rvar, atol=1e-7)

    ours = _loss_through(lambda *a: pool_minres.bn_relu_pool(*a, EPS)[0])
    refl = _loss_through(ref)
    g1 = jax.grad(ours, (0, 1, 2))(x, scale, bias)
    g2 = jax.grad(refl, (0, 1, 2))(x, scale, bias)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(u, v, atol=3e-5)


def test_bn_relu_pool_tie_first_wins():
    # quantized inputs force intra-window ties; gradient routing must
    # match SelectAndScatter's (and torch's) first-wins order. A
    # misrouted tie would move an O(1) readout weight between windows;
    # the tolerance only absorbs fp32 reduction noise.
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.round(rng.normal(size=(2, 8, 8, 3)) * 1.5) / 2,
                    jnp.float32)
    scale, bias = jnp.ones((3,)), jnp.zeros((3,))
    w = jnp.arange(1.0, 2 * 4 * 4 * 3 + 1).reshape(2, 4, 4, 3)

    def ref(x, scale, bias):
        z = jnp.maximum(_ref_bn(x, scale, bias)[0], 0)
        return nn.max_pool(z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    g1 = jax.grad(
        lambda x: jnp.sum(pool_minres.bn_relu_pool(x, scale, bias, EPS)[0] * w)
    )(x)
    g2 = jax.grad(lambda x: jnp.sum(ref(x, scale, bias) * w))(x)
    np.testing.assert_allclose(g1, g2, atol=1e-3)


def test_bn_relu_pool_rejects_odd_spatial():
    x = jnp.zeros((1, 7, 8, 3))
    with pytest.raises(ValueError, match="even"):
        jax.grad(
            lambda x: jnp.sum(
                pool_minres.bn_relu_pool(x, jnp.ones((3,)), jnp.zeros((3,)), EPS)[0]
            )
        )(x)


def test_minres_resnet_matches_fast_grads():
    """Full ResNet18: norm_kind='minres' must reproduce norm_kind='fast'
    values and gradients (conv params share names/RNG folds; BN inits
    are deterministic, so the param trees coincide numerically)."""
    from cl_ica_tpu.models.resnet import ResNet18

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
    out = {}
    for kind in ("fast", "minres"):
        m = ResNet18(num_classes=5, norm_kind=kind)
        v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

        def obj(p):
            z, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(z)), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(obj, has_aux=True)(v["params"])
        out[kind] = (loss, flatten_dict(grads), flatten_dict(bs))

    lf, gf, bf = out["fast"]
    lm, gm, bm = out["minres"]
    np.testing.assert_allclose(lf, lm, atol=1e-5)
    common = set(gf) & set(gm)
    assert len(common) >= 20  # all conv/dense leaves share key paths
    for k in common:
        np.testing.assert_allclose(gf[k], gm[k], atol=5e-5)
    # norm-param grads + running stats pair up positionally (module
    # class names differ: FastBatchNorm_i vs MinResBN_i / MinResBNPool)
    only_f, only_m = sorted(set(gf) - common), sorted(set(gm) - common)
    assert len(only_f) == len(only_m)  # zip() must not truncate a leaf
    for kf, km in zip(only_f, only_m):
        assert kf[-1] == km[-1]
        np.testing.assert_allclose(gf[kf], gm[km], atol=5e-5)
    assert len(bf) == len(bm)
    for kf, km in zip(sorted(bf), sorted(bm)):
        assert kf[-1] == km[-1]
        np.testing.assert_allclose(bf[kf], bm[km], atol=1e-5)


def test_minres_resnet_eval_mode_runs():
    from cl_ica_tpu.models.resnet import ResNet18

    m = ResNet18(num_classes=5, norm_kind="minres")
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    z = m.apply(v, x, train=False)
    assert z.shape == (2, 5) and bool(jnp.all(jnp.isfinite(z)))


def test_minres_argmax_stem_variant_matches():
    # the documented-negative argmax stem (stem_pool='argmax') must
    # still be CORRECT — kept for the record (EXPERIMENTS r3)
    from cl_ica_tpu.models.resnet import ResNet18

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    outs = {}
    for pool in ("xla", "argmax"):
        m = ResNet18(num_classes=5, norm_kind="minres", stem_pool=pool)
        v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

        def obj(p):
            z, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(z))

        outs[pool] = jax.value_and_grad(obj)(v["params"])
    np.testing.assert_allclose(outs["xla"][0], outs["argmax"][0], atol=1e-5)
    ga = flatten_dict(outs["xla"][1])
    gb = flatten_dict(outs["argmax"][1])
    for k in set(ga) & set(gb):
        np.testing.assert_allclose(ga[k], gb[k], atol=5e-5)


def test_fused_stem_pool_rejects_norm_none():
    from cl_ica_tpu.models.resnet import ResNet18

    m = ResNet18(num_classes=5, norm_kind="none", fused_stem_pool=True)
    with pytest.raises(ValueError, match="norm_kind"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_bn_relu_pool_rejects_odd_spatial_primal():
    # same invariant on the forward-only (non-differentiated) path —
    # previously only the VJP path validated it
    x = jnp.zeros((1, 7, 8, 3))
    with pytest.raises(ValueError, match="even"):
        pool_minres.bn_relu_pool(x, jnp.ones((3,)), jnp.zeros((3,)), EPS)
