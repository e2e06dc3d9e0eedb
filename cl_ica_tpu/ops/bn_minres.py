"""Minimal-residual BatchNorm(+add)+ReLU with a pure-XLA custom VJP.

Motivation (round-2 roofline, EXPERIMENTS.md): the 3DIdent ResNet18
train step is HBM-bandwidth-bound at 99.8% of the measured stream floor
*for its HLO byte volume* (61.5 GB), while the algorithmic floor for
BN-training the net in bf16 is ~40 GB. The gap is XLA/JAX's
save-everything residual policy: differentiating ``relu(bn(x))`` saves
both the BN input ``x`` (needed for the BN backward) and the pre-relu
activation ``z = x*a + b`` (needed only for the relu sign mask), so
every BN+ReLU costs one extra full-activation write in forward and one
extra full-activation read in backward.

This module removes that redundancy with ``jax.custom_vjp`` functions
whose residuals are only ``(x[, res], scale, bias, mean, rstd)`` — the
per-channel statistics plus tensors that are *already live* (conv
outputs are saved for the conv backward regardless). The backward pass
recomputes the relu mask from ``x`` on the fly; both backward sweeps are
plain fused XLA elementwise+reduction passes. Crucially this is pure
XLA — no Pallas custom call, so no row-major layout pinning and none of
the layout-copy cascades that sank the fused Pallas stem (EXPERIMENTS.md
round 2): XLA keeps its preferred batch-minor layouts straight through.

Math parity: identical to ``models.layers.FastBatchNorm`` (torch
BatchNorm2d training semantics: fast variance ``E[x²]−E[x]²`` clamped at
0, fp32 statistic accumulation over the raw input, per-channel affine
applied in the input dtype). Reference semantics target:
torchvision ResNet BN blocks as used by /root/reference/main_3dident.py:288-385.

Backward derivation (standard BN backward, N = spatial*batch elements
per channel, x̂ = (x−mean)·rstd, g = dy·1[z>0]):

    dscale = Σ g·x̂ = rstd·(Σ g·x − mean·Σ g)
    dbias  = Σ g
    dx     = scale·rstd·(g − Σg/N − x̂·(Σg·x̂)/N)
           = A·g − B·x + C          (per-channel A, B, C folded in fp32)

so backward = two fused passes over (x, dy) + one dx write — the
two-pass structure is the algorithmic minimum for batch normalization
(global sums must precede dx).

The ``mean``/``var`` outputs exist for running-statistics updates and
are NON-DIFFERENTIABLE: their cotangents are deliberately discarded in
the backward (the Flax wrapper additionally wraps them in
``stop_gradient`` so the contract is visible in the jaxpr). Do not
differentiate a loss through them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _channel_stats(x):
    """fp32 (mean, var) over all non-channel axes, FastBatchNorm math."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axes, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), axes, dtype=jnp.float32)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return mean, var


def _affine(scale, bias, mean, rstd, dtype):
    inv = scale * rstd
    return inv.astype(dtype), (bias - mean * inv).astype(dtype)


# ---------------------------------------------------------------- bn_relu


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu(x, scale, bias, eps):
    """Training-mode BN→ReLU. Returns (y, mean, var); stats fp32,
    non-differentiable (see module docstring)."""
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, jax.lax.rsqrt(var + eps), x.dtype)
    y = jnp.maximum(x * a + b, 0)
    return y, mean, var


def _bn_bwd_core(x, scale, mean, rstd, g, g2=None):
    """Shared BN backward given the masked upstream gradient g.

    g2: optionally a CSE-distinct recomputation of g for the dx pass.
    Without it XLA materializes g (used by both the sum pass and the dx
    pass — one full-activation write per BN); callers can pass a copy
    whose cheap recompute expression is made non-CSE-able (barrier on
    the per-channel affine), so each pass rebuilds g from (x, dy)
    in-register instead.
    """
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    # pass 1: global per-channel sums over (g, x) — one fused sweep
    sum_g = jnp.sum(g, axes, dtype=jnp.float32)
    sum_gx = jnp.sum(g * x, axes, dtype=jnp.float32)
    dscale = (sum_gx - mean * sum_g) * rstd
    dbias = sum_g
    # fold the per-channel dx coefficients in fp32:
    #   dx = A*g - B*x + C
    inv = scale * rstd
    A = inv
    B = inv * rstd * (dscale / n)
    C = inv * (rstd * (dscale / n) * mean - sum_g / n)
    dx = (
        A.astype(x.dtype) * (g if g2 is None else g2)
        - B.astype(x.dtype) * x
        + C.astype(x.dtype)
    )
    return dx, dscale, dbias


def _mask_grad(x, a, b, dy, res=None, barrier=False):
    """g = dy * 1[x*a + b (+res) > 0]; with barrier=True the per-channel
    affine goes through optimization_barrier so the expression is not
    CSE-merged with a sibling copy (see _bn_bwd_core g2)."""
    if barrier:
        a, b = jax.lax.optimization_barrier((a, b))
    z = x * a + b
    if res is not None:
        z = z + res
    return jnp.where(z > 0, dy, jnp.zeros((), x.dtype))


# The relu mask needs the full affine, so bias (per-channel, free) is
# carried in the residuals alongside x/scale/mean/rstd.
def _bn_relu_fwd(x, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    y = jnp.maximum(x * a + b, 0)
    return (y, mean, var), (x, scale, bias, mean, rstd)


def _bn_relu_bwd(eps, residuals, cotangents):
    dy, _dmean, _dvar = cotangents
    x, scale, bias, mean, rstd = residuals
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    g = _mask_grad(x, a, b, dy)
    g2 = _mask_grad(x, a, b, dy, barrier=True)
    dx, dscale, dbias = _bn_bwd_core(x, scale, mean, rstd, g, g2)
    return dx, dscale, dbias


bn_relu.defvjp(_bn_relu_fwd, _bn_relu_bwd)


# ----------------------------------------------------------- bn_add_relu


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def bn_add_relu(x, res, scale, bias, eps):
    """Training-mode BN(x) + res → ReLU (the ResNet block tail:
    zero-init-scale BN on the conv branch, residual add, relu).
    Returns (y, mean, var); stats non-differentiable."""
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, jax.lax.rsqrt(var + eps), x.dtype)
    y = jnp.maximum(x * a + b + res, 0)
    return y, mean, var


def _bn_add_relu_fwd(x, res, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    y = jnp.maximum(x * a + b + res, 0)
    return (y, mean, var), (x, res, scale, bias, mean, rstd)


def _bn_add_relu_bwd(eps, residuals, cotangents):
    dy, _dmean, _dvar = cotangents
    x, res, scale, bias, mean, rstd = residuals
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    # g doubles as the residual-branch cotangent output here, so it is
    # materialized regardless — no recompute copy needed for dx
    g = _mask_grad(x, a, b, dy, res=res)
    dx, dscale, dbias = _bn_bwd_core(x, scale, mean, rstd, g)
    return dx, g, dscale, dbias


bn_add_relu.defvjp(_bn_add_relu_fwd, _bn_add_relu_bwd)


# ---------------------------------------------------------------- bn_only


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_only(x, scale, bias, eps):
    """Training-mode BN with no activation (projection shortcuts).
    Returns (y, mean, var); stats non-differentiable."""
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, jax.lax.rsqrt(var + eps), x.dtype)
    return x * a + b, mean, var


def _bn_only_fwd(x, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    return (x * a + b, mean, var), (x, scale, mean, rstd)


def _bn_only_bwd(eps, residuals, cotangents):
    dy, _dmean, _dvar = cotangents
    x, scale, mean, rstd = residuals
    dx, dscale, dbias = _bn_bwd_core(x, scale, mean, rstd, dy)
    return dx, dscale, dbias


bn_only.defvjp(_bn_only_fwd, _bn_only_bwd)
