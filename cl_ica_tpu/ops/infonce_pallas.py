"""Fused Lp-InfoNCE negative-logsumexp as a Pallas TPU kernel.

The hot object of every contrastive loss here is the B×B pairwise
Lp-distance matrix (losses.py:436-450 in the reference; BASELINE.json
north star). Materializing it costs B²·4 bytes of HBM each way (151 MB
at B=6144; 17 GB at B=65k) plus a separate logsumexp pass. This kernel
streams (BM×BN) distance tiles through VMEM and maintains an online
logsumexp (running max + rescaled sum — the flash-attention trick), so
HBM sees only the (B, n) operands and the (B,) result. That makes
global-batch InfoNCE feasible at batch sizes where the XLA-fused jnp
path OOMs, and at any p without the B×B×n broadcast.

Layout note: z3 is fed pre-transposed (n, B) so the per-feature row
z3ᵀ[k, :] is lane-aligned — the (BM, BN) broadcast subtract compiles to
pure VPU ops with no in-kernel transposes. dz3 is likewise produced
transposed and flipped once outside.

forward:   lse_i = log Σ_j exp(-d(z1_i, z3_j)/τ),  d = Σ_k |Δ_k|^p
backward:  dz1_i = -(p/τ)·c_i·Σ_j w_ij |Δ|^{p-1} sgn(Δ),
           dz3_j = +(p/τ)·Σ_i c_i w_ij |Δ|^{p-1} sgn(Δ),
           w_ij = exp(-d_ij/τ - lse_i)   (softmax weights, recomputed)

Supports p ≥ 1 with the reference's pow=True semantics; other cases fall
back to the jnp path in losses.infonce. Grads for p=1 use sgn(Δ) with
sgn(0)=0 (torch subgradient parity). p=2 is fully MXU-resident: the
distance tile is the dot identity (one systolic pass) and both backward
weighted-difference sums decompose into tile matmuls plus rank-1 terms
(see _dz1_kernel/_dz3_kernel) — flash-attention structure, Lp flavor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


_HIGHEST = jax.lax.Precision.HIGHEST


def _dist_tile(z1_blk, z3t_blk, p: float, n_feat: int):
    """(BM, BN) Lp^p distances from z1 (BM, n) and z3ᵀ (n, BN) blocks.

    p == 2 rides the MXU via the dot identity ||a-b||² = |a|² + |b|²
    - 2a·b — one systolic pass per tile, same identity (and the same
    'highest' precision) as the jnp path in losses.pairwise_lp_distance.
    Other p unroll over the feature dim (n VPU passes over the tile)."""
    bm, bn = z1_blk.shape[0], z3t_blk.shape[1]
    if p == 2.0:
        sq1 = jnp.sum(z1_blk * z1_blk, axis=1)  # (BM,)
        sq3 = jnp.sum(z3t_blk * z3t_blk, axis=0)  # (BN,)
        cross = jnp.dot(z1_blk, z3t_blk, precision=_HIGHEST,
                        preferred_element_type=jnp.float32)
        return jnp.maximum(sq1[:, None] + sq3[None, :] - 2.0 * cross, 0.0)
    d = jnp.zeros((bm, bn), dtype=jnp.float32)
    for k in range(n_feat):
        diff = z1_blk[:, k][:, None] - z3t_blk[k, :][None, :]
        if p == 1.0:
            d += jnp.abs(diff)
        else:
            d += jnp.abs(diff) ** p
    return d


def _grad_tile(diff, p: float):
    """d|Δ|^p/dΔ = p·|Δ|^{p-1}·sgn(Δ) up to the constant p (applied by the
    caller). sgn convention at 0 matches torch subgradients."""
    if p == 2.0:
        return diff
    if p == 1.0:
        return jnp.sign(diff)
    return jnp.sign(diff) * jnp.abs(diff) ** (p - 1.0)


def _fwd_kernel(nvalid_ref, z1_ref, z3t_ref, out_ref, m_s, s_s, *, p, tau, bn, n_feat):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)

    d = _dist_tile(z1_ref[:], z3t_ref[:], p, n_feat)
    x = -d / tau  # (BM, BN)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + j * bn
    x = jnp.where(col < nvalid_ref[0], x, NEG_INF)

    m_old = m_s[:, 0]
    m_new = jnp.maximum(m_old, jnp.max(x, axis=1))
    s_s[:, 0] = s_s[:, 0] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(x - m_new[:, None]), axis=1
    )
    m_s[:, 0] = m_new

    @pl.when(j == nj - 1)
    def _():
        out_ref[:, 0] = m_s[:, 0] + jnp.log(s_s[:, 0])


def _dz1_kernel(
    nvalid_ref, z1_ref, z3t_ref, lse_ref, ct_ref, out_ref, acc, *, p, tau, bn, n_feat
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    z1_blk = z1_ref[:]
    z3t_blk = z3t_ref[:]
    d = _dist_tile(z1_blk, z3t_blk, p, n_feat)
    w = jnp.exp(-d / tau - lse_ref[:, 0][:, None])  # (BM, BN)
    col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + j * bn
    w = jnp.where(col < nvalid_ref[0], w, 0.0)
    scale = (-p / tau) * ct_ref[:, 0]  # (BM,)
    if p == 2.0:
        # Σ_j w_ij (z1_i - z3_j) = z1_i·rowsum(w)_i - (w @ z3)_i: the
        # weighted-negative sum is one MXU contraction over BN instead
        # of n VPU reduction passes. dot_general contracts w's dim 1
        # with z3ᵀ's dim 1 — no materialized transpose.
        rs = jnp.sum(w, axis=1)  # (BM,)
        wz3 = jax.lax.dot_general(
            w, z3t_blk, (((1,), (1,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32,
        )  # (BM, n)
        acc[:] += scale[:, None] * (z1_blk * rs[:, None] - wz3)
    else:
        for k in range(n_feat):
            diff = z1_blk[:, k][:, None] - z3t_blk[k, :][None, :]
            acc[:, k] += scale * jnp.sum(w * _grad_tile(diff, p), axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc[:]


def _dz3_kernel(
    nvalid_ref, z3t_ref, z1_ref, lse_ref, ct_ref, out_ref, acc, *, p, tau, bm, n_feat
):
    # grid: (col block j, row block i) — accumulate over row blocks i.
    # Output is dz3ᵀ (n, BN) so per-feature rows stay lane-aligned.
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    z1_blk = z1_ref[:]  # (BM, n)
    z3t_blk = z3t_ref[:]  # (n, BN)
    d = _dist_tile(z1_blk, z3t_blk, p, n_feat)  # (BM, BN)
    w = jnp.exp(-d / tau - lse_ref[:, 0][:, None])
    row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * bm
    w = jnp.where(row < nvalid_ref[0], w, 0.0)
    cw = w * ct_ref[:, 0][:, None]  # (BM, BN)
    if p == 2.0:
        # Σ_i cw_ij (z1_i - z3_j) = (z1ᵀ @ cw)_j - z3_j·colsum(cw)_j:
        # MXU contraction over BM (z1's dim 0 with cw's dim 0).
        cs = jnp.sum(cw, axis=0)  # (BN,)
        z1cw = jax.lax.dot_general(
            z1_blk, cw, (((0,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32,
        )  # (n, BN)
        acc[:] += (p / tau) * (z1cw - z3t_blk * cs[None, :])
    else:
        for k in range(n_feat):
            diff = z1_blk[:, k][:, None] - z3t_blk[k, :][None, :]
            acc[k, :] += (p / tau) * jnp.sum(cw * _grad_tile(diff, p), axis=0)

    @pl.when(i == ni - 1)
    def _():
        out_ref[:] = acc[:]


def _pad_rows(x, block):
    b = x.shape[0]
    pad = (-b) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_neg_lse(z1, z3, p: float, tau: float, block: int = 512,
                  interpret: bool = False):
    """lse_i = log Σ_j exp(-||z1_i - z3_j||_p^p / τ), shape (B,).

    Never materializes B×B in HBM. Use interpret=True off-TPU (tests).
    """
    out, _ = _fwd(z1, z3, p, tau, block, interpret)
    return out


def _fwd(z1, z3, p, tau, block, interpret):
    # rectangular contract: z1 is (M, n) rows, z3 is (N, n) negatives —
    # M == N in the single-device loss, M == N/n_shards in the per-shard
    # shard_map composition (parallel.collective). Row and column grids
    # are sized independently.
    b, n_feat = z1.shape
    z1p = _pad_rows(z1.astype(jnp.float32), block)
    z3t = _pad_rows(z3.astype(jnp.float32), block).T  # (n, Np)
    bp = z1p.shape[0]
    mi = bp // block  # row blocks (z1)
    nj = z3t.shape[1] // block  # column blocks (z3)
    nvalid = jnp.array([z3.shape[0]], dtype=jnp.int32)

    kernel = functools.partial(_fwd_kernel, p=p, tau=tau, bn=block, n_feat=n_feat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mi, nj),
        in_specs=[
            pl.BlockSpec((block, n_feat), lambda i, j, nv: (i, 0)),
            pl.BlockSpec((n_feat, block), lambda i, j, nv: (0, j)),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i, j, nv: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
    )
    lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(nvalid, z1p, z3t)
    lse = lse[:b, 0]
    return lse, (z1, z3, lse)


def _bwd(p, tau, block, interpret, res, ct):
    z1, z3, lse = res
    b, n_feat = z1.shape
    # backward holds ~5 (block, block) temporaries live (d, w, cw, diff,
    # grad tile) — block 512 blows the 16 MB scoped-VMEM limit; 256 fits
    # with headroom and keeps the VPU pipelined.
    block = min(block, 256)
    z1p = _pad_rows(z1.astype(jnp.float32), block)
    z3t = _pad_rows(z3.astype(jnp.float32), block).T
    bp = z1p.shape[0]
    mi = bp // block  # row blocks (z1)
    nj = z3t.shape[1] // block  # column blocks (z3)
    # rectangular masks: dz1 masks COLUMNS by the valid z3 count, dz3
    # masks ROWS by the valid z1 count
    nvalid_cols = jnp.array([z3.shape[0]], dtype=jnp.int32)
    nvalid_rows = jnp.array([b], dtype=jnp.int32)
    pad = bp - b
    lse_p = jnp.concatenate([lse, jnp.zeros((pad,), lse.dtype)])[:, None]
    ct_p = jnp.concatenate([ct, jnp.zeros((pad,), ct.dtype)])[:, None]

    dz1 = pl.pallas_call(
        functools.partial(_dz1_kernel, p=p, tau=tau, bn=block, n_feat=n_feat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mi, nj),
            in_specs=[
                pl.BlockSpec((block, n_feat), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((n_feat, block), lambda i, j, nv: (0, j)),
                pl.BlockSpec((block, 1), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((block, 1), lambda i, j, nv: (i, 0)),
            ],
            out_specs=pl.BlockSpec((block, n_feat), lambda i, j, nv: (i, 0)),
            scratch_shapes=[pltpu.VMEM((block, n_feat), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bp, n_feat), jnp.float32),
        interpret=interpret,
    )(nvalid_cols, z1p, z3t, lse_p, ct_p)

    dz3t = pl.pallas_call(
        functools.partial(_dz3_kernel, p=p, tau=tau, bm=block, n_feat=n_feat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nj, mi),
            in_specs=[
                pl.BlockSpec((n_feat, block), lambda j, i, nv: (0, j)),  # z3ᵀ
                pl.BlockSpec((block, n_feat), lambda j, i, nv: (i, 0)),  # z1
                pl.BlockSpec((block, 1), lambda j, i, nv: (i, 0)),  # lse
                pl.BlockSpec((block, 1), lambda j, i, nv: (i, 0)),  # ct
            ],
            out_specs=pl.BlockSpec((n_feat, block), lambda j, i, nv: (0, j)),
            scratch_shapes=[pltpu.VMEM((n_feat, block), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_feat, z3t.shape[1]), jnp.float32),
        interpret=interpret,
    )(nvalid_rows, z3t, z1p, lse_p, ct_p)

    return (dz1[:b].astype(z1.dtype),
            dz3t.T[: z3.shape[0]].astype(z3.dtype))


def _fwd_rule(z1, z3, p, tau, block, interpret):
    lse, res = _fwd(z1, z3, p, tau, block, interpret)
    return lse, res


fused_neg_lse.defvjp(_fwd_rule, _bwd)


# ---------------- dot-product (SimCLR) variant ----------------
#
# lse_i = log Σ_j exp(z1_i · z3_j / τ): the p=0 path (SimCLRLoss). The
# similarity tile rides the MXU (pl-level matmul) with the same online
# logsumexp; backward reuses the softmax-weights structure:
#   dz1 = (c ⊙ W) @ z3 / τ,   dz3 = (c ⊙ W)ᵀ @ z1 / τ
# both again MXU matmuls, accumulated tile by tile.


def _dot_fwd_kernel(nvalid_ref, z1_ref, z3t_ref, out_ref, m_s, s_s, *, tau, bn):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)

    x = jnp.dot(z1_ref[:], z3t_ref[:], precision=_HIGHEST,
                preferred_element_type=jnp.float32) / tau
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + j * bn
    x = jnp.where(col < nvalid_ref[0], x, NEG_INF)

    m_old = m_s[:, 0]
    m_new = jnp.maximum(m_old, jnp.max(x, axis=1))
    s_s[:, 0] = s_s[:, 0] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(x - m_new[:, None]), axis=1
    )
    m_s[:, 0] = m_new

    @pl.when(j == nj - 1)
    def _():
        out_ref[:, 0] = m_s[:, 0] + jnp.log(s_s[:, 0])


def _dot_dz1_kernel(
    nvalid_ref, z1_ref, z3t_ref, lse_ref, ct_ref, out_ref, acc, *, tau, bn
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = jnp.dot(z1_ref[:], z3t_ref[:], precision=_HIGHEST,
                preferred_element_type=jnp.float32) / tau
    w = jnp.exp(x - lse_ref[:, 0][:, None])
    col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + j * bn
    w = jnp.where(col < nvalid_ref[0], w, 0.0)
    cw = w * (ct_ref[:, 0] / tau)[:, None]
    acc[:] += jnp.dot(cw, z3t_ref[:].T, precision=_HIGHEST,
                      preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc[:]


def _dot_dz3_kernel(
    nvalid_ref, z3t_ref, z1_ref, lse_ref, ct_ref, out_ref, acc, *, tau, bm
):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = jnp.dot(z1_ref[:], z3t_ref[:], precision=_HIGHEST,
                preferred_element_type=jnp.float32) / tau
    w = jnp.exp(x - lse_ref[:, 0][:, None])
    row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * bm
    w = jnp.where(row < nvalid_ref[0], w, 0.0)
    cw = w * (ct_ref[:, 0] / tau)[:, None]  # (BM, BN)
    # dz3ᵀ accumulation: (n, BM) @ (BM, BN) -> (n, BN)
    acc[:] += jnp.dot(z1_ref[:].T, cw, precision=_HIGHEST,
                      preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_dot_lse(z1, z3, tau: float, block: int = 512, interpret: bool = False):
    """lse_i = log Σ_j exp(z1_i · z3_j / τ), shape (B,) — the SimCLR
    negatives term, streamed through VMEM (B×B never touches HBM)."""
    out, _ = _dot_fwd(z1, z3, tau, block, interpret)
    return out


def _dot_fwd(z1, z3, tau, block, interpret):
    # rectangular contract (see _fwd): z1 (M, n) rows, z3 (N, n) negatives
    b, n_feat = z1.shape
    z1p = _pad_rows(z1.astype(jnp.float32), block)
    z3t = _pad_rows(z3.astype(jnp.float32), block).T
    bp = z1p.shape[0]
    mi = bp // block
    nj = z3t.shape[1] // block
    nvalid = jnp.array([z3.shape[0]], dtype=jnp.int32)
    lse = pl.pallas_call(
        functools.partial(_dot_fwd_kernel, tau=tau, bn=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mi, nj),
            in_specs=[
                pl.BlockSpec((block, n_feat), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((n_feat, block), lambda i, j, nv: (0, j)),
            ],
            out_specs=pl.BlockSpec((block, 1), lambda i, j, nv: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block, 1), jnp.float32),
                pltpu.VMEM((block, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(nvalid, z1p, z3t)
    lse = lse[:b, 0]
    return lse, (z1, z3, lse)


def _dot_bwd(tau, block, interpret, res, ct):
    z1, z3, lse = res
    b, n_feat = z1.shape
    block = min(block, 256)
    z1p = _pad_rows(z1.astype(jnp.float32), block)
    z3t = _pad_rows(z3.astype(jnp.float32), block).T
    bp = z1p.shape[0]
    mi = bp // block
    nj = z3t.shape[1] // block
    nvalid_cols = jnp.array([z3.shape[0]], dtype=jnp.int32)
    nvalid_rows = jnp.array([b], dtype=jnp.int32)
    pad = bp - b
    lse_p = jnp.concatenate([lse, jnp.zeros((pad,), lse.dtype)])[:, None]
    ct_p = jnp.concatenate([ct, jnp.zeros((pad,), ct.dtype)])[:, None]

    dz1 = pl.pallas_call(
        functools.partial(_dot_dz1_kernel, tau=tau, bn=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mi, nj),
            in_specs=[
                pl.BlockSpec((block, n_feat), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((n_feat, block), lambda i, j, nv: (0, j)),
                pl.BlockSpec((block, 1), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((block, 1), lambda i, j, nv: (i, 0)),
            ],
            out_specs=pl.BlockSpec((block, n_feat), lambda i, j, nv: (i, 0)),
            scratch_shapes=[pltpu.VMEM((block, n_feat), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bp, n_feat), jnp.float32),
        interpret=interpret,
    )(nvalid_cols, z1p, z3t, lse_p, ct_p)

    dz3t = pl.pallas_call(
        functools.partial(_dot_dz3_kernel, tau=tau, bm=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nj, mi),
            in_specs=[
                pl.BlockSpec((n_feat, block), lambda j, i, nv: (0, j)),
                pl.BlockSpec((block, n_feat), lambda j, i, nv: (i, 0)),
                pl.BlockSpec((block, 1), lambda j, i, nv: (i, 0)),
                pl.BlockSpec((block, 1), lambda j, i, nv: (i, 0)),
            ],
            out_specs=pl.BlockSpec((n_feat, block), lambda j, i, nv: (0, j)),
            scratch_shapes=[pltpu.VMEM((n_feat, block), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_feat, z3t.shape[1]), jnp.float32),
        interpret=interpret,
    )(nvalid_rows, z3t, z1p, lse_p, ct_p)

    return (dz1[:b].astype(z1.dtype),
            dz3t.T[: z3.shape[0]].astype(z3.dtype))


def _dot_fwd_rule(z1, z3, tau, block, interpret):
    return _dot_fwd(z1, z3, tau, block, interpret)


fused_dot_lse.defvjp(_dot_fwd_rule, _dot_bwd)
