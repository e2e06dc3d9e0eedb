"""Sub-bf16 (float8) residual variants of the minimal-residual BN ops.

Round-3 ledger result (EXPERIMENTS.md): the 3DIdent ResNet train step is
at the HBM stream floor for the byte volume XLA's operational semantics
can express in bf16 — the residual set is irreducible at 2 bytes/elem.
The ONLY remaining byte lever on this chip was a *sub-bf16 activation
format* for the saved tensors. This module is that lever, built and
MEASURED NEGATIVE (−0.30 GB of a predicted −2.0, 1% slower — see the
precision/byte notes below); it ships opt-in as the recorded result
(``ResNet(norm_kind='minres8')``, ``main_3dident --norm-kind minres8``),
completing the floor argument: the ~63 GB is the attainable volume
under XLA:TPU regardless of residual dtype.

Mechanism: instead of saving the BN input ``x`` (bf16, the conv output)
for backward, save the *normalized* activation ``x̂ = (x − mean)·rstd``
quantized to ``float8_e4m3fn``. x̂ is per-channel standardized by
construction — empirically ⊂ [−10, 10] ⊂ ±448 = e4m3 range — so no
scale factor is needed and the 3 mantissa bits give ~3% relative
rounding error on a unit-variance tensor. The backward rewrites
cleanly in x̂ terms (N = batch·spatial elements per channel,
g = dy·1[scale·x̂+bias(+res) > 0], inv = scale·rstd):

    dscale = Σ g·x̂
    dbias  = Σ g
    dx     = inv·(g − Σg/N − x̂·(Σ g·x̂)/N)

so backward needs only (x̂q, scale, bias, rstd) — ``mean`` drops out of
the residual set entirely.

Byte accounting per BN+ReLU at activation volume |x| (vs bn_minres):
forward +0.5·|x| (the f8 x̂ write; the bf16 x still materializes — it is
a conv-fusion output and the batch statistics must complete before x̂
can be formed, so a second pass is inherent), backward −1.0·|x| (two
f8 reads replace two bf16 reads). Hand count: **−0.5·|x| ≈ −2.0 GB**
on the 63 GB bench step. MEASURED: **−0.30 GB and 1% slower** — XLA
rematerializes the quantize into the backward (keeping bf16 x live)
in part of the graph, and barriering the quantize into forward costs
more than it saves (EXPERIMENTS r3-cont has the full ledger account).
This op therefore ships OPT-IN as the recorded sub-bf16 result: even
below-bf16 residual formats cannot shed bytes on this net — the floor
argument closes at the operational-semantics level, not the dtype
level. Conv operands are never f8 (converts only fuse into
elementwise/reduction consumers on TPU).

PRECISION CONTRACT: the forward pass is **bit-identical** to
``bn_minres`` (y is computed from the full-precision x). Only the
*gradients* see the quantization, from two sources: (1) the channel
sums ``Σ g·x̂`` carry sub-1% rounding noise (isolated by the mask-free
``bn_only8`` in tests); (2) the relu gate is re-derived from the
quantized preactivation, so elements with |z| within the quantization
error of the kink get the other branch's (sub)gradient — i.e. this
computes the EXACT gradient of a network whose relu gates read the
quantized x̂, a straight-through-style approximation worth ~10% dx
rel-L2 on unit-variance data (tests/test_bn_minres8.py pins both
sources). Since the variant buys no bytes, quality was never the
deciding axis: use ``norm_kind='minres'`` (default, exact torch
gradients) for real training.

Stats outputs (mean, var) are non-differentiable, as in bn_minres.
Reference semantics target: torchvision ResNet BN training blocks,
/root/reference/main_3dident.py:288-385.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bn_minres import _affine, _channel_stats

_QDTYPE = jnp.float8_e4m3fn


def _quantize(x, mean, rstd):
    """f8 x̂ = (x − mean)·rstd, computed in fp32 then rounded once.

    NOTE (measured, EXPERIMENTS r3-cont): XLA partially rematerializes
    this cheap elementwise chain into the backward fusions — extending
    the bf16 x's liveness and computing x̂q there as an extra product —
    so the realized saving is −0.30 GB, not the −2.0 GB the hand count
    predicts. Pinning the quantize in forward with an
    optimization_barrier was measured WORSE (+3.2 GB: it breaks the
    conv/stats fusion the quantize otherwise rides). Keep the plain
    form; see the EXPERIMENTS entry for the full account.
    """
    xh = (x.astype(jnp.float32) - mean) * rstd
    return xh.astype(_QDTYPE)


def _bwd_core8(xh, scale, rstd, g, g2=None):
    """BN backward in x̂ terms. xh: dequantized x̂ (compute dtype),
    g: masked upstream gradient; g2: optional CSE-distinct recompute of
    g for the dx pass (same trick as bn_minres._bn_bwd_core)."""
    axes = tuple(range(xh.ndim - 1))
    n = xh.size // xh.shape[-1]
    sum_g = jnp.sum(g, axes, dtype=jnp.float32)
    sum_gxh = jnp.sum(g * xh, axes, dtype=jnp.float32)
    dscale = sum_gxh
    dbias = sum_g
    inv = scale * rstd
    A = inv
    B = inv * (sum_gxh / n)
    C = inv * (sum_g / n)
    dt = xh.dtype
    dx = A.astype(dt) * (g if g2 is None else g2) - B.astype(dt) * xh - C.astype(dt)
    return dx, dscale, dbias


def _mask8(xh, scale, bias, dy, res=None, barrier=False):
    """g = dy·1[scale·x̂ + bias (+res) > 0] from the quantized x̂."""
    a = scale.astype(xh.dtype)
    b = bias.astype(xh.dtype)
    if barrier:
        a, b = jax.lax.optimization_barrier((a, b))
    z = xh * a + b
    if res is not None:
        z = z + res
    return jnp.where(z > 0, dy, jnp.zeros((), xh.dtype))


# ---------------------------------------------------------------- bn_relu8


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu8(x, scale, bias, eps):
    """Training-mode BN→ReLU, f8 x̂ residual. Forward bit-identical to
    bn_minres.bn_relu; gradients quantization-approximate (module
    docstring). Returns (y, mean, var); stats non-differentiable."""
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, jax.lax.rsqrt(var + eps), x.dtype)
    y = jnp.maximum(x * a + b, 0)
    return y, mean, var


def _bn_relu8_fwd(x, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    y = jnp.maximum(x * a + b, 0)
    return (y, mean, var), (_quantize(x, mean, rstd), scale, bias, rstd)


def _bn_relu8_bwd(eps, residuals, cotangents):
    dy, _dmean, _dvar = cotangents
    xq, scale, bias, rstd = residuals
    xh = xq.astype(dy.dtype)  # dy carries the forward compute dtype
    g = _mask8(xh, scale, bias, dy)
    g2 = _mask8(xh, scale, bias, dy, barrier=True)
    dx, dscale, dbias = _bwd_core8(xh, scale, rstd, g, g2)
    return dx, dscale, dbias


bn_relu8.defvjp(_bn_relu8_fwd, _bn_relu8_bwd)


# ----------------------------------------------------------- bn_add_relu8


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def bn_add_relu8(x, res, scale, bias, eps):
    """Training-mode BN(x) + res → ReLU (block tail), f8 x̂ residual.
    Returns (y, mean, var); stats non-differentiable."""
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, jax.lax.rsqrt(var + eps), x.dtype)
    y = jnp.maximum(x * a + b + res, 0)
    return y, mean, var


def _bn_add_relu8_fwd(x, res, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    y = jnp.maximum(x * a + b + res, 0)
    return (y, mean, var), (
        _quantize(x, mean, rstd), res, scale, bias, rstd,
    )


def _bn_add_relu8_bwd(eps, residuals, cotangents):
    dy, _dmean, _dvar = cotangents
    xq, res, scale, bias, rstd = residuals
    xh = xq.astype(dy.dtype)
    # g doubles as the residual-branch cotangent output (materialized
    # regardless) — no recompute copy needed for the dx pass
    g = _mask8(xh, scale, bias, dy, res=res)
    dx, dscale, dbias = _bwd_core8(xh, scale, rstd, g)
    return dx, g, dscale, dbias


bn_add_relu8.defvjp(_bn_add_relu8_fwd, _bn_add_relu8_bwd)


# ---------------------------------------------------------------- bn_only8


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_only8(x, scale, bias, eps):
    """Training-mode BN, no activation (projection shortcuts), f8 x̂
    residual. Returns (y, mean, var); stats non-differentiable."""
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, jax.lax.rsqrt(var + eps), x.dtype)
    return x * a + b, mean, var


def _bn_only8_fwd(x, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    return (x * a + b, mean, var), (_quantize(x, mean, rstd), scale, rstd)


def _bn_only8_bwd(eps, residuals, cotangents):
    dy, _dmean, _dvar = cotangents
    xq, scale, rstd = residuals
    xh = xq.astype(dy.dtype)
    dx, dscale, dbias = _bwd_core8(xh, scale, rstd, dy)
    return dx, dscale, dbias


bn_only8.defvjp(_bn_only8_fwd, _bn_only8_bwd)


# drop-in module aliases: models.layers.MinResBN(residuals_f8=True)
# imports this module under the bn_minres name and calls these
bn_relu = bn_relu8
bn_add_relu = bn_add_relu8
bn_only = bn_only8
