"""Explicit-collective InfoNCE via shard_map.

The GSPMD path (parallel.sharded) lets XLA place the all-gather; this
module is the hand-written equivalent for when explicit control is
wanted — e.g. to run the fused Pallas kernel per shard (Pallas calls
can't be auto-partitioned by GSPMD):

  rows of the B×B similarity matrix stay local to each chip; the
  negatives' codes (n·B floats — tiny) ride one all_gather over ICI;
  each chip computes its row-block logsumexp (optionally with the
  streaming Pallas kernel) and the mean reduces with one psum.

This is SURVEY.md §2.3's "TPU-native equivalent" made concrete: mesh +
shard_map + {all_gather, psum}, no NCCL analog anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.infonce import pairwise_lp_distance


def sharded_lp_neg_lse(
    mesh: Mesh,
    p: float,
    tau: float,
    axis: str = "data",
    use_pallas: bool = None,
):
    """Returns fn(z1_sharded, z3_sharded) -> per-row lse, row-sharded.

    lse_i = log Σ_j exp(-||z1_i - z3_j||_p^p / τ) over the GLOBAL batch.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and p != 2.0

    def local_fn(z1_local, z3_local):
        z3_global = jax.lax.all_gather(z3_local, axis, tiled=True)
        if use_pallas:
            from ..ops.infonce_pallas import fused_neg_lse

            return fused_neg_lse(z1_local, z3_global, p, tau)
        d = pairwise_lp_distance(z1_local, z3_global, p, pow_=True)
        return jax.scipy.special.logsumexp(-d / tau, axis=1)

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )
    )


def sharded_lp_simclr_loss(
    mesh: Mesh,
    p: float,
    tau: float = 1.0,
    alpha: float = 0.5,
    axis: str = "data",
    use_pallas: bool = None,
):
    """Full LpSimCLR (simclr-compatibility mode) with explicit
    collectives: returns fn(z1_rec, z2_rec, z3_rec) -> scalar mean loss,
    inputs row-sharded over `axis`, negatives global."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and p != 2.0

    def local_fn(z1_local, z2_local, z3_local):
        z3_global = jax.lax.all_gather(z3_local, axis, tiled=True)
        pos = jnp.sum(jnp.abs(z1_local - z2_local) ** p, axis=-1)
        if use_pallas:
            from ..ops.infonce_pallas import fused_neg_lse

            lse = fused_neg_lse(z1_local, z3_global, p, tau)
        else:
            d = pairwise_lp_distance(z1_local, z3_global, p, pow_=True)
            lse = jax.scipy.special.logsumexp(-d / tau, axis=1)
        loss_neg = jnp.logaddexp(lse, -pos / tau)  # pos column folded in
        loss = 2 * (alpha * pos / tau + (1 - alpha) * loss_neg)
        return jax.lax.pmean(jnp.mean(loss), axis)  # psum/n over ICI

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
    )


def store_gather_shardmap(mesh: Mesh, store_shape, axis: str = "data"):
    """Unjitted shard_map gather over a row-sharded store — composable
    inside a larger jitted step (see sharded.make_sharded_3dident_train_
    step). Same semantics as sharded_store_gather below."""
    n_rows = store_shape[0]
    n_shards = mesh.shape[axis]
    assert n_rows % n_shards == 0, (n_rows, n_shards)
    rows_per_shard = n_rows // n_shards

    def local_fn(local_store, idx):
        me = jax.lax.axis_index(axis)
        local_idx = idx - me * rows_per_shard
        mine = (local_idx >= 0) & (local_idx < rows_per_shard)
        safe = jnp.clip(local_idx, 0, rows_per_shard - 1)
        rows = local_store[safe].astype(jnp.float32)
        contrib = jnp.where(
            mine.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0.0
        )
        return jax.lax.psum(contrib, axis)

    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P()
    )


def store_gather_scatter(mesh: Mesh, store_shape, axis: str = "data"):
    """Row-gather from a mesh-sharded store, returning a ROW-SHARDED
    batch — the train-path replacement for store_gather_shardmap
    (VERDICT r2 weak #4).

    store_gather_shardmap assembles the batch with a float32 all-reduce
    of the full (B, H, W, C) volume on every chip (≈ 2·4·V_B bytes of
    ICI traffic per chip at batch volume V_B), then the caller
    immediately re-shards, discarding (n−1)/n of what was gathered.
    Since the training step only ever needs each chip's own B/n rows,
    this version uses one **uint8 psum_scatter** instead: every chip
    contributes the requested rows it owns (zeros elsewhere — exactly
    one nonzero contributor per row, so uint8 cannot overflow) and
    keeps only its batch block. ICI traffic: (n−1)/n · 1 · V_B bytes —
    an 8× reduction — and the result is already laid out for the
    row-sharded encoder. Byte accounting test:
    tests/test_train_parallel.py::test_store_gather_scatter_*.

    Returns fn(store_sharded, idx_replicated) -> (B/n, ...) uint8 rows,
    sharded P(axis); B must divide by the axis size.

    Hardware note: validated on the virtual CPU mesh (this host has one
    real chip). If a TPU pod's ICI reduce-scatter rejects u8 operands,
    XLA promotes the collective to a wider integer — still at worst
    equal to the old fp32 all-reduce; the semantics are unchanged
    either way.
    """
    n_rows = store_shape[0]
    n_shards = mesh.shape[axis]
    assert n_rows % n_shards == 0, (n_rows, n_shards)
    rows_per_shard = n_rows // n_shards

    def local_fn(local_store, idx):
        assert idx.shape[0] % n_shards == 0, (
            f"batch {idx.shape[0]} not divisible by {n_shards} shards"
        )
        me = jax.lax.axis_index(axis)
        local_idx = idx - me * rows_per_shard
        mine = (local_idx >= 0) & (local_idx < rows_per_shard)
        safe = jnp.clip(local_idx, 0, rows_per_shard - 1)
        rows = local_store[safe]  # stays uint8 — comm in 1 byte/px
        contrib = jnp.where(
            mine.reshape((-1,) + (1,) * (rows.ndim - 1)),
            rows,
            jnp.zeros((), rows.dtype),
        )
        return jax.lax.psum_scatter(
            contrib, axis, scatter_dimension=0, tiled=True
        )

    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis)
    )


def sharded_store_gather(mesh: Mesh, store_shape, axis: str = "data"):
    """Batch row-gather from a mesh-sharded device store.

    For datasets beyond one chip's HBM (the real 3DIdent render set is
    37 GB vs 16 GB HBM on v5e): shard the packed (N, ...) uint8 store
    row-wise over `axis` (N divisible by the axis size); each chip
    contributes the requested rows it owns and a psum assembles the
    (B, ...) batch on every chip. Communication is one psum of batch
    volume — independent of store size.

    Returns fn(store_sharded, idx_replicated) -> (B, ...) batch,
    replicated. Place the store with
    jax.device_put(arr, NamedSharding(mesh, P(axis))).
    """
    return jax.jit(store_gather_shardmap(mesh, store_shape, axis))
