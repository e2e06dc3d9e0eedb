"""Minimal-residual BN→ReLU→3×3/2-maxpool stem tail, pure XLA.

Round-3 follow-up to ops/bn_minres.py, attacking the largest entry in
the train-step byte ledger (tools/hlo_ledger.py). With the standard
composition, XLA's pipeline for the ResNet stem tail costs ~18 GB at
batch 1024×112²×64 bf16:

  - forward materializes z = relu(bn(x)) (1.64 GB) for the pool,
  - backward re-materializes z AGAIN (3.3 GB traffic) because
    SelectAndScatter (maxpool backward) must read the original operand,
  - SelectAndScatter itself re-reads z + the pooled cotangent and
    writes a full dz (3.7 GB).

This op never materializes z at all. Forward computes the pool with a
variadic reduce_window over (z, flat-index) whose comparator implements
first-wins argmax (ties → smallest row-major index — identical tie
order to XLA's SelectAndScatter and torch's MaxPool2d), and saves only
an int8 window-relative winner code (0.2 GB) plus (x, scale, bias,
mean, rstd). Backward reconstructs dz with a 9-offset stencil over the
interior-dilated (pooled-grid → input-grid) cotangent and code arrays —
all static pads/slices/selects that XLA fuses into the BN backward
sweeps — then applies the standard two-pass BN backward
(ops/bn_minres._bn_bwd_core).

Math parity: BN as FastBatchNorm (torch BatchNorm2d training semantics);
pool/relu gradients match torch MaxPool2d/ReLU exactly (first-wins
ties, relu'(0)=0). Reference target: the torchvision ResNet stem used by
/root/reference/main_3dident.py:288-385 (conv7/2 → BN → ReLU →
maxpool3/2). The mean/var outputs are NON-DIFFERENTIABLE (cotangents
discarded), as in bn_minres.

Constraint: H and W must be even (true for every 224² ResNet input).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .bn_minres import _affine, _bn_bwd_core, _channel_stats

_BIG = jnp.int32(2**30)


def _pool_fwd_core(z):
    """(pooled, winner_code) for 3×3/2 maxpool with padding 1.

    winner_code ∈ [0, 9): row-major position of the first-wins max
    within its window (padded coordinates), stored as int8.
    """
    n, h, w, c = z.shape
    if h % 2 or w % 2:
        raise ValueError(f"bn_relu_pool requires even H, W; got {(h, w)}")
    flat = (
        lax.broadcasted_iota(jnp.int32, z.shape, 1) * w
        + lax.broadcasted_iota(jnp.int32, z.shape, 2)
    )

    def comp(a, b):
        av, ai = a
        bv, bi = b
        take_a = (av > bv) | ((av == bv) & (ai < bi))
        return jnp.where(take_a, av, bv), jnp.where(take_a, ai, bi)

    p, win = lax.reduce_window(
        (z, flat),
        (jnp.asarray(-jnp.inf, z.dtype), _BIG),
        comp,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    # window top-left input coord is (2r-1, 2c-1); relative code 0..8
    out_r = lax.broadcasted_iota(jnp.int32, p.shape, 1)
    out_c = lax.broadcasted_iota(jnp.int32, p.shape, 2)
    rel_r = win // w - (2 * out_r - 1)
    rel_c = win % w - (2 * out_c - 1)
    code = (rel_r * 3 + rel_c).astype(jnp.int8)
    return p, code


def _dilate_to_input_grid(arr, h, w, fill):
    """Place pooled-grid values at odd coordinates of the (h+2, w+2)
    padded input grid (window centers), zeros/fill elsewhere."""
    cfg = [(0, 0, 0), (1, 2, 1), (1, 2, 1), (0, 0, 0)]
    return lax.pad(arr, jnp.asarray(fill, arr.dtype), cfg)


def _dz_stencil(dp, code, h, w):
    """Reconstruct the maxpool input-cotangent dz from the pooled
    cotangent and the winner codes — 9 static shifted reads of the
    dilated arrays, fully fusible."""
    dpd = _dilate_to_input_grid(dp, h, w, 0)
    coded = _dilate_to_input_grid(code, h, w, -1)
    dz = None
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            # the window centered at (j+dr, j+dc) credits input j iff
            # its winner sits at relative position (1-dr, 1-dc)
            req = jnp.int8((1 - dr) * 3 + (1 - dc))
            dps = lax.slice(
                dpd, (0, 1 + dr, 1 + dc, 0),
                (dpd.shape[0], 1 + dr + h, 1 + dc + w, dpd.shape[3]),
            )
            cds = lax.slice(
                coded, (0, 1 + dr, 1 + dc, 0),
                (coded.shape[0], 1 + dr + h, 1 + dc + w, coded.shape[3]),
            )
            term = jnp.where(cds == req, dps, jnp.zeros((), dps.dtype))
            dz = term if dz is None else dz + term
    return dz


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu_pool(x, scale, bias, eps):
    """Training-mode BN→ReLU→maxpool(3×3/2, pad 1).

    Returns (pooled, mean, var); mean/var are fp32 batch statistics for
    the running-average update and are NON-DIFFERENTIABLE.
    """
    mean, var = _channel_stats(x)
    a, b = _affine(scale, bias, mean, lax.rsqrt(var + eps), x.dtype)
    z = jnp.maximum(x * a + b, 0)
    p, _ = _pool_fwd_core(z)
    return p, mean, var


def _bn_relu_pool_fwd(x, scale, bias, eps):
    mean, var = _channel_stats(x)
    rstd = lax.rsqrt(var + eps)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    z = jnp.maximum(x * a + b, 0)
    p, code = _pool_fwd_core(z)
    return (p, mean, var), (x, scale, bias, mean, rstd, code)


def _bn_relu_pool_bwd(eps, residuals, cotangents):
    dp, _dmean, _dvar = cotangents
    x, scale, bias, mean, rstd, code = residuals
    n, h, w, c = x.shape
    dz = _dz_stencil(dp, code, h, w)
    a, b = _affine(scale, bias, mean, rstd, x.dtype)
    g = jnp.where(x * a + b > 0, dz, jnp.zeros((), x.dtype))
    dx, dscale, dbias = _bn_bwd_core(x, scale, mean, rstd, g)
    return dx, dscale, dbias


bn_relu_pool.defvjp(_bn_relu_pool_fwd, _bn_relu_pool_bwd)
