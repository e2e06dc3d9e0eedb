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

Mosaic layout strategy (the part that makes this compile on TPU):
(H, W, C) tensors tile their LAST TWO dims onto (sublane, lane) vectors,
so stride-2 W-subsampling via reshape is an "unsupported shape cast".
Instead the kernel works on x viewed as (H, W/2, 2C) — a free,
contiguous reshape done in XLA outside the kernel — where the two lane
halves [0:C] / [C:2C] are the even/odd W columns. The W window of
output col j is then {B[j−1], A[j], B[j]} (one sublane shift + two
static lane slices), and the H window rides the untiled leading dim
(pad + leading-dim reshapes are free). Padding uses ZERO fill, which is
exactly equivalent to −inf here: z = relu(y) ≥ 0, and any window whose
max is 0 contributes no gradient anywhere because the ReLU mask (y > 0)
kills it — value- and gradient-exact vs nn.max_pool semantics.

Gradient notes:
- Full through-the-statistics BatchNorm backward
  (dx = γσ⁻¹·[dy − Σdy/M − x̂·Σ(dy·x̂)/M]).
- Maxpool ties break to the first element in row-major window order
  (matches XLA's SelectAndScatter select order). The argmax is
  recomputed in both backward sweeps from x — bit-identical to the
  forward because the same dtypes and op order are used.
- Kernels bound their live-temporary set by accumulating through VMEM
  refs (a functional 9-leaf max tree kept every window view alive at
  once and blew Mosaic's VMEM stack at 112²×64 blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# generous scoped-VMEM cap: the per-image working set (z map + argmax +
# dz/dy scratch) exceeds Mosaic's 16 MB default at 112×112×64
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# functional spec (oracle for the interpreter tests; also documents the
# exact window/tie semantics the kernels implement)
# ---------------------------------------------------------------------------


def _pool_views(zp):
    """9 shifted (Ho, Wo, C) views of a padded (H+2, W+2, C) map, in
    row-major (dh, dw) window order (defines the tie-break)."""
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


def _shift_up_3d(a):
    """A[i+1, ...] with zero fill on the last row."""
    return jnp.pad(a[1:], ((0, 1),) + ((0, 0),) * (a.ndim - 1))


def _shift_left_w(a):
    """A[:, j+1, :] with zero fill on the last column."""
    return jnp.pad(a[:, 1:], ((0, 0), (0, 1), (0, 0)))


def _scatter_pool_grad(g, arg):
    """Distribute pooled-output grads back to input positions (spec).

    dz[2m,   2n  ] = C4[m, n]
    dz[2m,   2n+1] = C3[m, n+1] + C5[m, n]
    dz[2m+1, 2n  ] = C1[m+1, n] + C7[m, n]
    dz[2m+1, 2n+1] = C0[m+1, n+1] + C2[m+1, n] + C6[m, n+1] + C8[m, n]

    where C_k = g·[arg = k] and out-of-range C is zero.
    """
    ho, wo, c = g.shape

    def ck(k):
        return jnp.where(arg == k, g, jnp.zeros_like(g))

    q_ee = ck(4)
    q_eo = _shift_left_w(ck(3)) + ck(5)
    q_oe = _shift_up_3d(ck(1)) + ck(7)
    q_oo = (
        _shift_up_3d(_shift_left_w(ck(0)))
        + _shift_up_3d(ck(2))
        + _shift_left_w(ck(6))
        + ck(8)
    )
    row_even = jnp.stack([q_ee, q_eo], axis=2).reshape(ho, 2 * wo, c)
    row_odd = jnp.stack([q_oe, q_oo], axis=2).reshape(ho, 2 * wo, c)
    return jnp.stack([row_even, row_odd], axis=1).reshape(2 * ho, 2 * wo, c)


def _recompute_dy(x, g, a, b):
    """Functional spec of the shared backward recompute."""
    y = x * a + b
    z = jnp.maximum(y, jnp.zeros((), y.dtype))
    _, arg = _max_and_arg(_pool_views(_pad_neg_inf(z)))
    dz = _scatter_pool_grad(g, arg)
    return jnp.where(y > 0, dz, jnp.zeros_like(dz))


# ---------------------------------------------------------------------------
# kernel building blocks (fused-lane layout: per-image (H, WO, 2C))
# ---------------------------------------------------------------------------


def _shift_w(a, delta):
    """a[:, j+delta, :] with zero fill, delta ∈ {−1, +1}.

    Sublane-dim shift as roll + iota mask (Mosaic lowers pltpu.roll
    natively for 32-bit data; pad+slice on the sublane dim does not
    lower, and bf16 rotate is unimplemented — callers pass f32)."""
    wo = a.shape[1]
    rolled = pltpu.roll(a, shift=(-delta) % wo, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    keep = col > 0 if delta == -1 else col < wo - 1
    return jnp.where(keep, rolled, jnp.zeros_like(rolled))


def _h_window(p, dh):
    """H-direction window row for output row i: padded row 2i+dh, where
    p is (H+2, WO, C) with one zero row on top and one below. Built with
    leading-dim reshapes only (H is untiled)."""
    hp = p.shape[0]  # H + 2, even
    ho = (hp - 2) // 2
    if dh < 2:
        return p[: hp - 2].reshape(ho, 2, p.shape[1], p.shape[2])[:, dh]
    return p[2:].reshape(ho, 2, p.shape[1], p.shape[2])[:, 0]


def _interleave_h(even, odd):
    """(HO, WO, C) × 2 → (H, WO, C), rows alternating — leading dims."""
    ho, wo, c = even.shape
    return jnp.stack([even, odd], axis=1).reshape(2 * ho, wo, c)


def _cmp_gt(a, b):
    """a > b (callers keep kernel values in f32 — Mosaic's VPU
    comparison rejects bf16, and mixed 16/32-bit tiles force costly
    repack relayouts)."""
    return a > b


def _w_max_arg(z2, c):
    """Factorized W stage: per input row h and output col j, max and
    first-wins argmax over the W window {B[j−1] (dw=0), A[j] (dw=1),
    B[j] (dw=2)}. Factorized (argh ∘ argw) first-wins equals the
    row-major (dh, dw) tie order of the spec: argh picks the smallest
    tied dh, then argw the smallest tied dw within that row."""
    a_half = z2[:, :, :c]
    b_half = z2[:, :, c:]
    wm = _shift_w(b_half, -1)  # dw=0 first
    argw = jnp.zeros(wm.shape, jnp.int32)
    take = _cmp_gt(a_half, wm)
    wm = jnp.where(take, a_half, wm)
    argw = jnp.where(take, 1, argw)
    take = _cmp_gt(b_half, wm)
    wm = jnp.where(take, b_half, wm)
    argw = jnp.where(take, 2, argw)
    return wm, argw


def _h_rows(wm):
    """The 3 H-window row views of padded wm, dh = 0, 1, 2."""
    p = jnp.pad(wm, ((1, 1), (0, 0), (0, 0)))
    return [_h_window(p, dh) for dh in range(3)]


def _fwd_kernel(x2_ref, a2_ref, b2_ref, out_ref):
    """Forward: value-based (no VMEM scratch). Mosaic keeps the
    intermediate maps in registers; ref-based scratch forced VMEM
    round-trips that made the first version ~4x slower."""
    c = out_ref.shape[-1]
    y = x2_ref[0].astype(jnp.float32) * a2_ref[0] + b2_ref[0]
    z2 = jnp.maximum(y, 0.0)
    wm, _ = _w_max_arg(z2, c)
    r0, r1, r2 = _h_rows(wm)
    out_ref[0] = jnp.maximum(jnp.maximum(r0, r1), r2).astype(out_ref.dtype)


def _bwd_kernel(x2_ref, g_ref, a2_ref, b2_ref, mean2_ref, rstd2_ref,
                dy_ref, sb_ref, sg_ref):
    """One sweep: recompute the factorized argmax, route g back to input
    positions (dy, materialized in the fused layout for the XLA dx
    pass), and accumulate the per-channel BN sums across the grid.
    Value-based for the same register-residency reason as the forward.

    All internal compute is f32: (8,128) tiles match the int32 argmax
    masks (no bf16<->32-bit repack relayouts), and the affine matches
    torch's fp32 BatchNorm arithmetic.
    """
    c = g_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        sb_ref[:] = jnp.zeros_like(sb_ref)
        sg_ref[:] = jnp.zeros_like(sg_ref)

    y = x2_ref[0].astype(jnp.float32) * a2_ref[0] + b2_ref[0]
    z2 = jnp.maximum(y, 0.0)
    wm, argw = _w_max_arg(z2, c)

    # H stage: first-wins argmax over the 3 window rows
    r0, r1, r2 = _h_rows(wm)
    m = r0
    argh = jnp.zeros(m.shape, jnp.int32)
    take = r1 > m
    m = jnp.where(take, r1, m)
    argh = jnp.where(take, 1, argh)
    take = r2 > m
    argh = jnp.where(take, 2, argh)

    # scatter through H: row h receives g[i] iff h = 2i−1+argh[i]
    g = g_ref[0].astype(jnp.float32)
    zero = jnp.zeros_like(g)
    even_rows = jnp.where(argh == 1, g, zero)
    odd_rows = _shift_up_3d(jnp.where(argh == 0, g, zero)) + jnp.where(
        argh == 2, g, zero
    )
    dwm = _interleave_h(even_rows, odd_rows)  # (H, WO, C)

    # scatter through W: even half ← dw=1; odd half ← own dw=2 plus
    # col j+1's dw=0
    zero = jnp.zeros_like(dwm)
    dz_a = jnp.where(argw == 1, dwm, zero)
    dz_b = jnp.where(argw == 2, dwm, zero) + _shift_w(
        jnp.where(argw == 0, dwm, zero), +1
    )
    dz2 = jnp.concatenate([dz_a, dz_b], axis=-1)
    # relu mask: z2 > 0 ⇔ y > 0
    dyf = jnp.where(z2 > 0.0, dz2, jnp.zeros_like(dz2))
    dy_ref[0] = dyf.astype(dy_ref.dtype)

    xhat = (x2_ref[0].astype(jnp.float32) - mean2_ref[0]) * rstd2_ref[0]
    sb_ref[0] += jnp.sum(dyf, axis=(0, 1))
    sg_ref[0] += jnp.sum(dyf * xhat, axis=(0, 1))


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _img_spec(h, w, c):
    return pl.BlockSpec(
        (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _dup(v):
    """Per-channel (C,) vector → (1, 2C) for the fused-lane layout."""
    return jnp.concatenate([v, v]).reshape(1, -1)


def _run_fwd(x, a, b, interpret):
    n, h, w, c = x.shape
    x2 = x.reshape(n, h, w // 2, 2 * c)  # contiguous → free in XLA
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[
            _img_spec(h, w // 2, 2 * c),
            _vec_spec(2 * c),
            _vec_spec(2 * c),
        ],
        out_specs=_img_spec(h // 2, w // 2, c),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x2, _dup(a), _dup(b))


def _run_bwd(x, g, a, b, mean, rstd, interpret):
    """Single backward sweep: returns (dy fused-layout bf16, sb, sg)."""
    n, h, w, c = x.shape
    x2 = x.reshape(n, h, w // 2, 2 * c)
    dy2, sb2, sg2 = pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=[
            _img_spec(h, w // 2, 2 * c),
            _img_spec(h // 2, w // 2, c),
            _vec_spec(2 * c),
            _vec_spec(2 * c),
            _vec_spec(2 * c),
            _vec_spec(2 * c),
        ],
        out_specs=(
            _img_spec(h, w // 2, 2 * c),
            _vec_spec(2 * c),
            _vec_spec(2 * c),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w // 2, 2 * c), g.dtype),
            jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x2, g, _dup(a), _dup(b), _dup(mean), _dup(rstd))
    # the two lane halves hold the even-w / odd-w partial sums
    sb = sb2[0, :c] + sb2[0, c:]
    sg = sg2[0, :c] + sg2[0, c:]
    return dy2.reshape(n, h, w, c), sb, sg


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
      the unbiased correction there exactly like FastBatchNorm).

    .. warning::
       The ``mean``/``var`` outputs are NON-DIFFERENTIABLE: the custom
       VJP silently discards their cotangents (they exist to feed
       running-statistic buffers, which torch does not differentiate
       either). Do NOT differentiate a loss through them — e.g. a
       statistic-matching regularizer built on these outputs would
       receive silently-zero gradients. Pinned by
       tests/test_stem_pallas.py::test_stats_outputs_carry_no_gradient.
    """
    return _fwd_impl(x, scale, bias, eps, interpret)[0]


def _fwd_impl(x, scale, bias, eps, interpret):
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(
            "bn_relu_pool_train requires even H and W (3x3/2 pool with "
            f"padding 1 over an even grid); got H={x.shape[1]}, "
            f"W={x.shape[2]}"
        )
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
    dy, sb, sg = _run_bwd(x, g, a, b, mean, rstd, interpret)
    m_count = x.shape[0] * x.shape[1] * x.shape[2]
    k1 = scale * rstd
    k2 = k1 * sb / m_count
    k3 = k1 * sg / m_count
    # final dx is pure elementwise over (dy, x): one fused XLA pass
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dx = (k1 * dy.astype(jnp.float32) - k2 - k3 * xhat).astype(x.dtype)
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
