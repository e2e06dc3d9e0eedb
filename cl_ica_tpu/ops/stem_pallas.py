"""Fused BatchNorm→ReLU→3×3/2-maxpool Pallas kernel (the ResNet stem tail).

Why this exists: the 3DIdent ResNet18 train step is HBM-bandwidth-bound
(EXPERIMENTS.md round-2 roofline: 61.5 GB of HLO traffic at the measured
505 GB/s stream rate; the stem alone is ~57 ms of the 122 ms step at
batch 1024 images). XLA materializes the post-BN/ReLU activation at
112×112×64 (1.64 GB in bf16 at batch 1024) purely so the 3×3/2 maxpool
and the backward SelectAndScatter can consume it. Fusing
normalize+relu+pool into one kernel — with a custom VJP that keeps only
the conv output and the batch statistics as residuals and *recomputes*
the relu mask and pool argmax on the fly — deletes that tensor (and the
SelectAndScatter) from HBM entirely:

  fwd:  read x once, write the 4×-smaller pooled output
  bwd:  two sweeps over (x, g) — channel-sum pass, then dx pass —
        instead of XLA's saved-activation chain

Reference semantics matched: torchvision's ``maxpool(relu(bn(conv(x))))``
stem (used via `/root/reference/main_3dident.py:288-385`); BN math is
`models/layers.FastBatchNorm` (biased batch variance for normalization,
stats accumulated in fp32 directly from the bf16 input, elementwise
affine applied in the input dtype).

Gradient notes:
- Full through-the-statistics BatchNorm backward
  (dx = γσ⁻¹·[dy − Σdy/M − x̂·Σ(dy·x̂)/M]).
- Maxpool ties break to the first element in row-major window order
  (matches XLA's SelectAndScatter select order). The argmax is
  recomputed in both backward sweeps from x — bit-identical to the
  forward because the same dtypes and op order are used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_views(zp):
    """9 shifted (Ho, Wo, C) views of a padded (H+2, W+2, C) map.

    Windows of the 3×3/stride-2/pad-1 maxpool: output (i, j) covers
    padded rows 2i..2i+2 and cols 2j..2j+2. Built from reshapes +
    static slices only (no strided slicing — lowers cleanly in Mosaic).
    Returned in row-major (dh, dw) order, which defines the tie-break.
    """
    hp, wp, c = zp.shape
    h, w = hp - 2, wp - 2
    ho, wo = h // 2, w // 2

    def h_plane(dh):
        block = jax.lax.slice_in_dim(zp, dh, dh + h, axis=0)
        return block.reshape(ho, 2, wp, c)[:, 0]

    def w_view(plane, dw):
        block = jax.lax.slice_in_dim(plane, dw, dw + w, axis=1)
        return block.reshape(ho, wo, 2, c)[:, :, 0]

    views = []
    for dh in range(3):
        plane = h_plane(dh)
        for dw in range(3):
            views.append(w_view(plane, dw))
    return views


def _max_and_arg(views):
    """Running max + first-wins argmax over the 9 pool views."""
    m = views[0]
    arg = jnp.zeros(m.shape, jnp.int32)
    for k in range(1, 9):
        take = views[k] > m  # strict: ties keep the earlier index
        m = jnp.where(take, views[k], m)
        arg = jnp.where(take, k, arg)
    return m, arg


def _pad_neg_inf(z):
    neg = jnp.asarray(jnp.finfo(z.dtype).min, z.dtype)
    return jnp.pad(z, ((1, 1), (1, 1), (0, 0)), constant_values=neg)


def _shift_up(a):
    """A[i+1, j] with zero fill (drop row 0 ... i.e. rows 1..n, pad end)."""
    return jnp.pad(a[1:], ((0, 1), (0, 0), (0, 0)))


def _shift_left(a):
    return jnp.pad(a[:, 1:], ((0, 0), (0, 1), (0, 0)))


def _scatter_pool_grad(g, arg):
    """Distribute pooled-output grads back to input positions.

    For input position (h, w): the windows containing it are the ≤4
    output cells (i, j) with 2i−1 ≤ h ≤ 2i+1 (ditto w); the grad lands
    there iff that window's argmax offset points at (h, w). Assembled
    as four interleaved parity quadrants from the per-offset masked
    grads C_k = g·[arg = k] (k = 3·dh + dw), avoiding any scatter op:

      dz[2m,   2n  ] = C4[m, n]
      dz[2m,   2n+1] = C3[m, n+1] + C5[m, n]
      dz[2m+1, 2n  ] = C1[m+1, n] + C7[m, n]
      dz[2m+1, 2n+1] = C0[m+1, n+1] + C2[m+1, n] + C6[m, n+1] + C8[m, n]
    """
    ho, wo, c = g.shape

    def ck(k):
        return jnp.where(arg == k, g, jnp.zeros_like(g))

    q_ee = ck(4)
    q_eo = _shift_left(ck(3)) + ck(5)
    q_oe = _shift_up(ck(1)) + ck(7)
    q_oo = (
        _shift_up(_shift_left(ck(0)))
        + _shift_up(ck(2))
        + _shift_left(ck(6))
        + ck(8)
    )
    row_even = jnp.stack([q_ee, q_eo], axis=2).reshape(ho, 2 * wo, c)
    row_odd = jnp.stack([q_oe, q_oo], axis=2).reshape(ho, 2 * wo, c)
    return jnp.stack([row_even, row_odd], axis=1).reshape(2 * ho, 2 * wo, c)


# ---------------------------------------------------------------------------
# kernels (grid over the batch; TPU grids run sequentially, so the
# channel-sum outputs accumulate across grid steps)
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, a_ref, b_ref, out_ref):
    x = x_ref[0]
    y = x * a_ref[0] + b_ref[0]
    z = jnp.maximum(y, jnp.zeros((), y.dtype))
    views = _pool_views(_pad_neg_inf(z))
    m = views[0]
    for k in range(1, 9):
        m = jnp.maximum(m, views[k])
    out_ref[0] = m


def _recompute_dy(x, g, a, b):
    """Shared bwd recompute: relu mask + pool argmax → dy (pre-pool grad)."""
    y = x * a + b
    z = jnp.maximum(y, jnp.zeros((), y.dtype))
    _, arg = _max_and_arg(_pool_views(_pad_neg_inf(z)))
    dz = _scatter_pool_grad(g, arg)
    return jnp.where(y > 0, dz, jnp.zeros_like(dz))


def _bwd_sums_kernel(x_ref, g_ref, a_ref, b_ref, mean_ref, rstd_ref,
                     sb_ref, sg_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        sb_ref[:] = jnp.zeros_like(sb_ref)
        sg_ref[:] = jnp.zeros_like(sg_ref)

    dy = _recompute_dy(x_ref[0], g_ref[0], a_ref[0], b_ref[0]).astype(
        jnp.float32
    )
    xhat = (x_ref[0].astype(jnp.float32) - mean_ref[0]) * rstd_ref[0]
    sb_ref[0] += jnp.sum(dy, axis=(0, 1))
    sg_ref[0] += jnp.sum(dy * xhat, axis=(0, 1))


def _bwd_dx_kernel(x_ref, g_ref, a_ref, b_ref, mean_ref, rstd_ref,
                   k1_ref, k2_ref, k3_ref, dx_ref):
    dy = _recompute_dy(x_ref[0], g_ref[0], a_ref[0], b_ref[0]).astype(
        jnp.float32
    )
    xf = x_ref[0].astype(jnp.float32)
    xhat = (xf - mean_ref[0]) * rstd_ref[0]
    dx = k1_ref[0] * dy - k2_ref[0] - k3_ref[0] * xhat
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _img_spec(h, w, c):
    return pl.BlockSpec(
        (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _run_fwd(x, a, b, interpret):
    n, h, w, c = x.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[_img_spec(h, w, c), _vec_spec(c), _vec_spec(c)],
        out_specs=_img_spec(h // 2, w // 2, c),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        interpret=interpret,
    )(x, a.reshape(1, c), b.reshape(1, c))


def _run_bwd_sums(x, g, a, b, mean, rstd, interpret):
    n, h, w, c = x.shape
    sb, sg = pl.pallas_call(
        _bwd_sums_kernel,
        grid=(n,),
        in_specs=[
            _img_spec(h, w, c),
            _img_spec(h // 2, w // 2, c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
        ],
        out_specs=(_vec_spec(c), _vec_spec(c)),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(
        x,
        g,
        a.reshape(1, c),
        b.reshape(1, c),
        mean.reshape(1, c),
        rstd.reshape(1, c),
    )
    return sb[0], sg[0]


def _run_bwd_dx(x, g, a, b, mean, rstd, k1, k2, k3, interpret):
    n, h, w, c = x.shape
    return pl.pallas_call(
        _bwd_dx_kernel,
        grid=(n,),
        in_specs=[
            _img_spec(h, w, c),
            _img_spec(h // 2, w // 2, c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
            _vec_spec(c),
        ],
        out_specs=_img_spec(h, w, c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(
        x,
        g,
        a.reshape(1, c),
        b.reshape(1, c),
        mean.reshape(1, c),
        rstd.reshape(1, c),
        k1.reshape(1, c),
        k2.reshape(1, c),
        k3.reshape(1, c),
    )


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_pool_train(x, scale, bias, eps=1e-5, interpret=False):
    """maxpool3×3/2(relu(batchnorm_train(x))) with minimal-residual VJP.

    Args:
      x: (N, H, W, C) activations (H, W even; typically bf16 conv output).
      scale, bias: (C,) fp32 BatchNorm affine parameters.
      eps: BN epsilon (static).
      interpret: run the Pallas kernels in interpreter mode (CPU tests).

    Returns:
      (pooled, mean, var): pooled (N, H/2, W/2, C) in x.dtype; mean/var
      the fp32 per-channel *batch* statistics (biased variance — what
      normalization used; callers handle running-stat updates, applying
      the unbiased correction there exactly like FastBatchNorm). The
      stats outputs carry no gradient (they feed running-stat buffers,
      which are not differentiated — torch parity).
    """
    return _fwd_impl(x, scale, bias, eps, interpret)[0]


def _fwd_impl(x, scale, bias, eps, interpret):
    axes = (0, 1, 2)
    mean = jnp.mean(x, axes, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), axes, dtype=jnp.float32)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = (rstd * scale).astype(x.dtype)
    b = (bias - mean * rstd * scale).astype(x.dtype)
    pooled = _run_fwd(x, a, b, interpret)
    return (pooled, mean, var), (x, scale, mean, rstd, a, b)


def _vjp_fwd(x, scale, bias, eps, interpret):
    (pooled, mean, var), res = _fwd_impl(x, scale, bias, eps, interpret)
    return (pooled, mean, var), res


def _vjp_bwd(eps, interpret, res, cots):
    g = cots[0]  # mean/var cotangents are running-stat plumbing: ignored
    x, scale, mean, rstd, a, b = res
    g = g.astype(x.dtype)
    sb, sg = _run_bwd_sums(x, g, a, b, mean, rstd, interpret)
    m_count = x.shape[0] * x.shape[1] * x.shape[2]
    k1 = scale * rstd
    k2 = k1 * sb / m_count
    k3 = k1 * sg / m_count
    dx = _run_bwd_dx(x, g, a, b, mean, rstd, k1, k2, k3, interpret)
    return dx, sg, sb


bn_relu_pool_train.defvjp(_vjp_fwd, _vjp_bwd)


def bn_relu_pool_reference(x, scale, bias, eps=1e-5):
    """Pure-jnp composition (same dtype choices) — test/eval oracle."""
    axes = (0, 1, 2)
    mean = jnp.mean(x, axes, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), axes, dtype=jnp.float32)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = (rstd * scale).astype(x.dtype)
    b = (bias - mean * rstd * scale).astype(x.dtype)
    z = jnp.maximum(x * a + b, 0)
    from flax import linen as nn

    return (
        nn.max_pool(z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))),
        mean,
        var,
    )
