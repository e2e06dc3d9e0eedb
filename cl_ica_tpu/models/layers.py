"""Constraint heads and activations not shipped with Flax.

Reference parity: /root/reference/layers.py (RescaleLayer :48-71,
SoftclipLayer :74-91) and the SmoothLeakyReLU activation of
invertible_network_utils.py:43-49.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def smooth_leaky_relu(x, alpha: float = 0.2):
    """alpha*x + (1-alpha)*log(1+exp(x)) — a C∞ leaky ReLU
    (invertible_network_utils.py:43-49). Uses softplus for stability."""
    return alpha * x + (1 - alpha) * nn.softplus(x)


class RescaleLayer(nn.Module):
    """Normalize outputs onto a hypersphere of fixed or learnable radius
    (layers.py:48-71). mode='eq' projects onto the sphere; 'leq' only
    rescales points outside it."""

    init_r: float = 1.0
    fixed_r: bool = False
    mode: str = "eq"

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("eq", "leq")
        if self.fixed_r:
            r = jnp.asarray(self.init_r, dtype=x.dtype)
        else:
            r = self.param("r", lambda k: jnp.ones((1,)) * self.init_r)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        if self.mode == "eq":
            return x / norm * r
        # 'leq': shrink only where ||x|| > r (branchless for jit)
        scale = jnp.where(norm > r, r / norm, 1.0)
        return x * scale


class SoftclipLayer(nn.Module):
    """Squash outputs into a hyperrectangle: sigmoid(x) * bound, with a
    fixed or learnable per-dim bound vector (layers.py:74-91)."""

    n: int
    init_abs_bound: float = 1.0
    fixed_abs_bound: bool = True

    @nn.compact
    def __call__(self, x):
        if self.fixed_abs_bound:
            bound = jnp.full((self.n,), self.init_abs_bound, dtype=x.dtype)
        else:
            bound = self.param(
                "max_abs_bound", lambda k: jnp.ones((self.n,)) * self.init_abs_bound
            )
        return nn.sigmoid(x) * bound[None, :]


class PositionalEncoding(nn.Module):
    """Exact port of the reference's PositionalEncoding (layers.py:10-27,
    unused by any driver — debug tier): concatenate two normalized
    meshgrid coordinate channels to NCHW input, channel-first like the
    torch original. For the TPU-native NHWC data path use
    PositionalEncoding2D below."""

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-2], x.shape[-1]
        rows = jnp.arange(h, dtype=x.dtype)[:, None] * jnp.ones((1, w), x.dtype)
        cols = jnp.ones((h, 1), x.dtype) * jnp.arange(w, dtype=x.dtype)[None, :]
        pos = jnp.stack([rows, cols], axis=0)
        pos = pos / (jnp.max(pos) + 1e-12)
        pos = jnp.broadcast_to(pos[None], (x.shape[0], 2, h, w))
        return jnp.concatenate([pos, x], axis=1)


class PositionalEncoding2D(nn.Module):
    """Concatenate normalized (row, col) coordinate channels to NHWC images
    (layers.py:10-27; reference is NCHW — here NHWC, TPU-native layout)."""

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        rows = jnp.arange(h, dtype=x.dtype)[:, None] * jnp.ones((1, w), x.dtype)
        cols = jnp.ones((h, 1), x.dtype) * jnp.arange(w, dtype=x.dtype)[None, :]
        pos = jnp.stack([rows, cols], axis=-1)
        pos = pos / (jnp.max(pos) + 1e-12)
        pos = jnp.broadcast_to(pos[None], (x.shape[0], h, w, 2))
        return jnp.concatenate([pos, x], axis=-1)


class FastBatchNorm(nn.Module):
    """BatchNorm whose autodiff residuals stay in the input dtype.

    Functionally identical to nn.BatchNorm (same params / running stats /
    use_fast_variance math), but statistics are accumulated in float32
    DIRECTLY from the (typically bfloat16) input — no float32 copy of the
    activation is ever created, so the backward pass saves the bf16 input
    instead of an fp32 upcast. At ResNet-stem spatial dims (112x112x64,
    batch 1024) that halves BatchNorm's HBM traffic, which profiling
    showed dominates the train step (tools/profile_resnet_stages.py:
    stem fwd+bwd 14 TF/s, 23 GB before this).

    The only reduced-precision op vs nn.BatchNorm is the elementwise
    square/normalize arithmetic in bf16 (stats accumulation itself is
    fp32); BN's epsilon floor makes this immaterial for training.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: object = nn.initializers.ones
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        import jax

        axes = tuple(range(x.ndim - 1))
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # fp32 ACCUMULATION over the raw input; fuses into one pass
            mean = jnp.mean(x, axes, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(x), axes, dtype=jnp.float32)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                n = x.size / c
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                # running var uses the unbiased estimate (torch parity)
                ra_var.value = m * ra_var.value + (1 - m) * var * (
                    n / max(n - 1, 1)
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        # per-channel affine applied in the input dtype
        a = inv.astype(x.dtype)
        b = (bias - mean * inv).astype(x.dtype)
        return x * a + b


class MinResBN(nn.Module):
    """BatchNorm(+residual-add)(+ReLU) with a minimal-residual custom VJP.

    Same training math / running-stat semantics as FastBatchNorm (torch
    BatchNorm2d parity: fast variance, fp32 stat accumulation, unbiased
    running var), but in training mode the fused ``ops.bn_minres``
    custom-VJP functions save only (x[, res], scale, bias, mean, rstd)
    for backward and recompute the relu mask on the fly — removing the
    pre-activation tensor XLA would otherwise materialize per BN+ReLU
    (see ops/bn_minres.py for the byte accounting). Pure XLA: no custom
    call, no layout pinning.

    ``act='relu'`` fuses the following ReLU; ``act='none'`` is a plain
    BN (projection shortcuts). Call with ``res=...`` to fuse the ResNet
    block's residual add before the ReLU. Eval mode is the plain
    composition. The batch mean/var used for running statistics are
    non-differentiable (stop_gradient — see bn_minres docstring).

    ``residuals_f8=True`` swaps in the ``ops.bn_minres8`` variants:
    the backward residual is the normalized activation quantized to
    float8_e4m3 (forward unchanged bit-for-bit; gradients carry ~3%
    per-element rounding noise — see ops/bn_minres8.py for the byte
    accounting and precision contract). Opt-in via
    ``ResNet(norm_kind='minres8')``.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    act: str = "relu"
    scale_init: object = nn.initializers.ones
    bias_init: object = nn.initializers.zeros
    residuals_f8: bool = False

    @nn.compact
    def __call__(self, x, res=None):
        import jax

        if self.residuals_f8:
            from ..ops import bn_minres8 as bn_minres
        else:
            from ..ops import bn_minres

        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            a = inv.astype(x.dtype)
            b = (bias - mean * inv).astype(x.dtype)
            y = x * a + b
            if res is not None:
                y = y + res
            return nn.relu(y) if self.act == "relu" else y
        if res is not None:
            assert self.act == "relu", "residual add requires act='relu'"
            y, mean, var = bn_minres.bn_add_relu(
                x, res, scale, bias, self.epsilon
            )
        elif self.act == "relu":
            y, mean, var = bn_minres.bn_relu(x, scale, bias, self.epsilon)
        else:
            y, mean, var = bn_minres.bn_only(x, scale, bias, self.epsilon)
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        m = self.momentum
        n = x.size / c
        ra_mean.value = m * ra_mean.value + (1 - m) * mean
        # running var uses the unbiased estimate (torch parity)
        ra_var.value = m * ra_var.value + (1 - m) * var * (n / max(n - 1, 1))
        return y


class MinResBNPool(nn.Module):
    """BN→ReLU→3×3/2-maxpool stem tail via the minimal-residual pure-XLA
    custom VJP (ops/pool_minres.py — argmax-code pool, no z
    materialization, no SelectAndScatter). Same params/stat semantics as
    FastBatchNorm/MinResBN; eval mode is the plain composition. The
    batch mean/var feeding the running stats are non-differentiable."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: object = nn.initializers.ones
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        import jax

        from ..ops.pool_minres import bn_relu_pool

        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            a = inv.astype(x.dtype)
            b = (bias - mean * inv).astype(x.dtype)
            z = nn.relu(x * a + b)
            return nn.max_pool(
                z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        pooled, mean, var = bn_relu_pool(x, scale, bias, self.epsilon)
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        m = self.momentum
        n = x.size / c
        ra_mean.value = m * ra_mean.value + (1 - m) * mean
        # running var uses the unbiased estimate (torch parity)
        ra_var.value = m * ra_var.value + (1 - m) * var * (n / max(n - 1, 1))
        return pooled


class StemBNReLUPool(nn.Module):
    """Fused BatchNorm→ReLU→3×3/2-maxpool (the ResNet stem tail).

    Parameter/stat names match FastBatchNorm ("scale"/"bias",
    batch_stats "mean"/"var"), so checkpoints interchange with the
    unfused ``norm → relu → max_pool`` stem. Training mode runs the
    Pallas kernel from ops/stem_pallas.py (minimal-residual custom VJP —
    see that module's HBM-traffic rationale); eval mode is the plain
    jnp composition (not a training hot path).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: object = nn.initializers.ones
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        import jax

        from ..ops.stem_pallas import bn_relu_pool_train

        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            a = inv.astype(x.dtype)
            b = (bias - mean * inv).astype(x.dtype)
            z = nn.relu(x * a + b)
            return nn.max_pool(
                z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        # compiled pltpu kernels only lower on TPU; every other backend
        # (cpu, gpu, ...) runs the interpreter (ADVICE r2)
        interpret = jax.default_backend() != "tpu"
        pooled, mean, var = bn_relu_pool_train(
            x, scale, bias, self.epsilon, interpret
        )
        m = self.momentum
        n = x.size / c
        ra_mean.value = m * ra_mean.value + (1 - m) * mean
        # running var uses the unbiased estimate (torch parity)
        ra_var.value = m * ra_var.value + (1 - m) * var * (n / max(n - 1, 1))
        return pooled
