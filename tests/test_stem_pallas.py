"""Fused stem kernel (ops/stem_pallas.py): parity vs the jnp composition.

Kernels run in Pallas interpret mode on CPU (repo convention; compiled
behavior is validated on TPU manually — see EXPERIMENTS.md). The oracle
is the exact unfused composition the kernel replaces: FastBatchNorm math
→ relu → nn.max_pool 3×3/2 pad 1 (torchvision stem tail semantics,
/root/reference/main_3dident.py:288-385).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_ica_tpu.ops.stem_pallas import (
    bn_relu_pool_reference,
    bn_relu_pool_train,
)


def _data(seed, n=3, h=16, w=16, c=8, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), dtype)
    scale = jnp.asarray(1.0 + 0.5 * rng.normal(size=(c,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("shape", [(3, 16, 16, 8), (2, 12, 20, 16)])
def test_forward_matches_reference(shape):
    x, scale, bias = _data(0, *shape)
    out, mean, var = bn_relu_pool_train(x, scale, bias, 1e-5, True)
    ref, rmean, rvar = bn_relu_pool_reference(x, scale, bias)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    np.testing.assert_allclose(mean, rmean, atol=1e-7)
    np.testing.assert_allclose(var, rvar, atol=1e-7)


def test_grads_match_reference_autodiff():
    x, scale, bias = _data(1)

    def loss(fn, x, s, b):
        o, _, _ = fn(x, s, b)
        return jnp.sum(jnp.sin(3.0 * o))

    gk = jax.grad(
        lambda *a: loss(lambda x, s, b: bn_relu_pool_train(x, s, b, 1e-5, True), *a),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    gr = jax.grad(
        lambda *a: loss(bn_relu_pool_reference, *a), argnums=(0, 1, 2)
    )(x, scale, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-5)


def test_bfloat16_forward():
    """bf16 inputs: the kernel applies the affine in f32 internally
    (torch fp32-BN parity; tighter than the bf16-elementwise oracle), so
    outputs may differ from the bf16 composition by 1 bf16 ulp."""
    x, scale, bias = _data(2, dtype=jnp.bfloat16)
    out, _, _ = bn_relu_pool_train(x, scale, bias, 1e-5, True)
    ref, _, _ = bn_relu_pool_reference(x, scale, bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), rtol=1e-2, atol=1e-2
    )


def test_stats_outputs_carry_no_gradient():
    x, scale, bias = _data(3)

    def loss(x):
        _, mean, var = bn_relu_pool_train(x, scale, bias, 1e-5, True)
        return jnp.sum(mean) + jnp.sum(var)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(g, jnp.zeros_like(g), atol=0)


def test_resnet_fused_stem_equivalence():
    """ResNet18 with fused_stem_pool=True matches norm_kind='fast' unfused
    — forward, batch-stat updates, and parameter gradients."""
    from cl_ica_tpu.models.resnet import ResNet18

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)

    def build(fused):
        model = ResNet18(
            num_classes=5, norm_kind="fast", fused_stem_pool=fused
        )
        vs = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, vs

    m0, v0 = build(False)
    m1, v1 = build(True)
    # identical parameter trees (names included) -> checkpoints interchange
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    def fwd(m, vs):
        out, mut = m.apply(
            vs, x, train=True, mutable=["batch_stats"],
            rngs={},
        )
        return out, mut

    out0, mut0 = fwd(m0, v0)
    out1, mut1 = fwd(m1, {"params": v0["params"], "batch_stats": v1["batch_stats"]})
    np.testing.assert_allclose(out0, out1, atol=2e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5),
        mut0, mut1,
    )

    def loss(m, params, stats):
        out, _ = m.apply(
            {"params": params, "batch_stats": stats},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(jnp.square(out))

    g0 = jax.grad(lambda p: loss(m0, p, v0["batch_stats"]))(v0["params"])
    g1 = jax.grad(lambda p: loss(m1, p, v0["batch_stats"]))(v0["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=3e-3, rtol=1e-3),
        g0, g1,
    )


def test_stem_module_eval_path_matches_fastbatchnorm():
    """StemBNReLUPool(use_running_average=True) must equal
    FastBatchNorm(eval) -> relu -> max_pool on the same running stats."""
    from flax import linen as nn

    from cl_ica_tpu.models.layers import FastBatchNorm, StemBNReLUPool

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)

    fused = StemBNReLUPool(use_running_average=True)
    vf = fused.init(jax.random.PRNGKey(0), x)
    # non-trivial running stats + affine
    stats = {
        "mean": jnp.asarray(rng.normal(size=(4,)), jnp.float32),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, (4,)), jnp.float32),
    }
    params = {
        "scale": jnp.asarray(1 + 0.3 * rng.normal(size=(4,)), jnp.float32),
        "bias": jnp.asarray(0.2 * rng.normal(size=(4,)), jnp.float32),
    }
    out = fused.apply({"params": params, "batch_stats": stats}, x)

    ref_bn = FastBatchNorm(use_running_average=True)
    vb = ref_bn.init(jax.random.PRNGKey(0), x)
    y = ref_bn.apply({"params": params, "batch_stats": stats}, x)
    ref = nn.max_pool(
        nn.relu(y), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)
