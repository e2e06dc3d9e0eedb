"""Model tests: shapes, constraint-head topology, invertible mixing
conditioning, init distributions."""

import jax
import jax.numpy as jnp
import numpy as np

from cl_ica_tpu.models import (
    ConvEncoder64,
    InvertibleMLP,
    MLPEncoder,
    ResNet18,
    construct_invertible_mlp,
    get_mlp,
    smooth_leaky_relu,
)

key = jax.random.PRNGKey(0)


def test_mlp_shapes_and_init():
    n = 10
    model = get_mlp(n, n, [n * 10, n * 50, n * 50, n * 50, n * 50, n * 10])
    params = model.init(key, jnp.zeros((2, n)))
    out = model.apply(params, jnp.ones((4, n)))
    assert out.shape == (4, n)
    # torch-default init: kernel bounded by 1/sqrt(fan_in)
    k0 = params["params"]["TorchLinear_0"]["kernel"]
    assert float(jnp.max(jnp.abs(k0))) <= 1.0 / np.sqrt(n) + 1e-6


def test_mlp_sphere_head():
    model = get_mlp(10, 10, [20], output_normalization="fixed_sphere")
    params = model.init(key, jnp.zeros((2, 10)))
    out = model.apply(params, jax.random.normal(key, (32, 10)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_mlp_learnable_sphere_head_param():
    model = get_mlp(10, 10, [20], output_normalization="learnable_sphere")
    params = model.init(key, jnp.zeros((2, 10)))
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = [jax.tree_util.keystr(p) for p, _ in flat]
    assert any("r" in n for n in names)


def test_mlp_box_head():
    model = get_mlp(10, 10, [20], output_normalization="fixed_box")
    params = model.init(key, jnp.zeros((2, 10)))
    out = model.apply(params, 100 * jax.random.normal(key, (32, 10)))
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_mlp_group_norm():
    model = get_mlp(10, 10, [20, 20], layer_normalization="gn")
    params = model.init(key, jnp.zeros((2, 10)))
    out = model.apply(params, jax.random.normal(key, (8, 10)))
    assert out.shape == (8, 10)


def test_smooth_leaky_relu():
    x = jnp.linspace(-5, 5, 101)
    y = smooth_leaky_relu(x, 0.2)
    exp = 0.2 * np.asarray(x) + 0.8 * np.log1p(np.exp(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-2, atol=1e-4)


def test_invertible_mlp_is_invertible():
    rng = np.random.default_rng(0)
    g = construct_invertible_mlp(
        n=10, n_layers=3, n_iter_cond_thresh=2000, cond_thresh_ratio=0.25, rng=rng
    )
    assert g.n_layers == 3
    for w in g.weights:
        c = np.linalg.cond(np.asarray(w))
        assert c < 100  # well-conditioned
        # column normalized
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(w), axis=0), 1.0, atol=1e-5
        )
    x = jax.random.normal(key, (16, 10))
    y = g(x)
    assert y.shape == (16, 10)
    # injectivity proxy: distinct inputs -> distinct outputs
    assert float(jnp.min(jnp.linalg.norm(y[:1] - y[1:], axis=-1))) > 1e-4


def test_invertible_mlp_rvs_orthogonal():
    rng = np.random.default_rng(0)
    g = construct_invertible_mlp(n=6, n_layers=2, weight_matrix_init="rvs", rng=rng)
    for w in g.weights:
        np.testing.assert_allclose(
            np.asarray(w) @ np.asarray(w).T, np.eye(6), atol=1e-5
        )


def test_invertible_mlp_jits():
    g = construct_invertible_mlp(n=5, n_layers=2, n_iter_cond_thresh=500,
                                 rng=np.random.default_rng(1))
    f = jax.jit(g)
    out = f(jnp.ones((3, 5)))
    assert out.shape == (3, 5)


def test_conv_encoder_64():
    model = ConvEncoder64(z_dim=10, nc=1)
    params = model.init(key, jnp.zeros((2, 64, 64, 1)))
    out = model.apply(params, jax.random.normal(key, (4, 64, 64, 1)))
    assert out.shape == (4, 10)


def test_conv_encoder_box_norm():
    model = ConvEncoder64(z_dim=3, nc=1, box_norm=True)
    params = model.init(key, jnp.zeros((2, 64, 64, 1)))
    out = model.apply(params, 10 * jax.random.normal(key, (4, 64, 64, 1)))
    assert float(jnp.min(out)) >= 0.0


def test_resnet18_shapes():
    model = ResNet18(num_classes=100)
    variables = model.init(key, jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.ones((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 100)
    # train mode mutates batch stats
    out, mutated = model.apply(
        variables, jnp.ones((2, 64, 64, 3)), train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated


def test_resnet_s2d_stem():
    model = ResNet18(num_classes=10, stem="s2d")
    variables = model.init(key, jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.ones((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 10)
    # same output resolution as conv7/2 stem -> same downstream shapes
    m2 = ResNet18(num_classes=10)
    v2 = m2.init(key, jnp.zeros((1, 64, 64, 3)))
    out2 = m2.apply(v2, jnp.ones((2, 64, 64, 3)), train=False)
    assert out.shape == out2.shape


def test_s2d_exact_stem_equals_conv7():
    """stem='s2d_exact' computes the SAME function as the 7x7/2 stem from
    the SAME (7,7,3,64) parameter (space-to-depth weight transform)."""
    import jax
    import jax.numpy as jnp
    from cl_ica_tpu.models.resnet import ResNet18

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    m1 = ResNet18(num_classes=4, stem="conv7")
    m2 = ResNet18(num_classes=4, stem="s2d_exact")
    v1 = m1.init(jax.random.PRNGKey(1), x[:1])
    v2 = m2.init(jax.random.PRNGKey(1), x[:1])
    v2["params"]["conv_init_kernel"] = v1["params"]["conv_init"]["kernel"]
    y1 = m1.apply(v1, x, train=False)
    y2 = m2.apply(v2, x, train=False)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-5


def test_fast_batchnorm_matches_torch_semantics():
    """FastBatchNorm == torch BatchNorm2d: outputs, running mean, and the
    UNBIASED running variance (flax BatchNorm tracks the biased one)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from cl_ica_tpu.models.layers import FastBatchNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (32, 6, 6, 8)) * 1.7 + 0.3
    fbn = FastBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = fbn.init(jax.random.PRNGKey(1), x)
    y, mut = fbn.apply(v, x, mutable=["batch_stats"])

    bn = torch.nn.BatchNorm2d(8, momentum=0.1, eps=1e-5)
    xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    bn.train()
    yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        bn.running_mean.numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        bn.running_var.numpy(), atol=1e-5,
    )
    # eval mode uses the running stats
    bn.eval()
    yte = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    ye = FastBatchNorm(use_running_average=True).apply(
        {"params": v["params"], "batch_stats": mut["batch_stats"]}, x
    )
    np.testing.assert_allclose(np.asarray(ye), yte, atol=1e-5)


def test_mlp_bf16_compute_dtype():
    """get_mlp(dtype=bf16): params stay fp32, the Linear stack computes
    in bf16, the head returns fp32, and outputs track the fp32 model to
    bf16 rounding (same params — dtype is compute-only, so checkpoints
    interchange). main_mlp exposes this as --bf16."""
    import jax

    n = 4
    f32 = get_mlp(n, n, [n * 10, n * 20])
    b16 = get_mlp(n, n, [n * 10, n * 20], dtype=jnp.bfloat16)
    params = f32.init(jax.random.PRNGKey(0), jnp.zeros((2, n)))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, n), jnp.float32)
    y32 = f32.apply(params, x)
    y16 = b16.apply(params, x)  # identical param tree
    assert y16.dtype == jnp.float32
    leaves = jax.tree.leaves(params)
    assert all(p.dtype == jnp.float32 for p in leaves)
    err = float(jnp.linalg.norm(y16 - y32) / jnp.linalg.norm(y32))
    assert err < 0.05, err
