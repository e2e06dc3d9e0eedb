"""Batched exact k-NN over the rendered-latent table — FAISS replacement.

The reference searches FAISS (C++/OpenMP `IndexFlatL2` or IVF/HNSW,
datasets/threedident_dataset.py:64-82) twice per sample inside
DataLoader workers. Here the whole batch of queries is matched at once
on-device: one MXU matmul (||q||² - 2q·tᵀ + ||t||²) + `lax.top_k`,
chunked over queries so the (Bq, N) distance block stays bounded. The
250k×10 table lives in HBM permanently (10 MB). Exact search dominates
the reference's approximate IVF mode in recall and, at batch size, in
throughput.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2, 3))
def l2_topk(
    table: jnp.ndarray,  # (N, d)
    queries: jnp.ndarray,  # (B, d)
    k: int = 1,
    block_q: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k smallest L2 distances. Returns (indices (B,k), sqdists (B,k)).

    Matches FAISS IndexFlatL2 ordering (ascending squared distance)."""
    table = table.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    t_sq = jnp.sum(table * table, axis=-1)  # (N,)

    def block_fn(q):
        q_sq = jnp.sum(q * q, axis=-1)  # (bq,)
        cross = jnp.matmul(q, table.T, precision="highest")  # MXU
        d = q_sq[:, None] - 2.0 * cross + t_sq[None, :]
        neg_d, idx = jax.lax.top_k(-d, k)
        return idx, -neg_d

    b = queries.shape[0]
    if b <= block_q or b % block_q != 0:
        return block_fn(queries)
    blocks = queries.reshape(b // block_q, block_q, -1)
    idx, d = jax.lax.map(block_fn, blocks)
    return idx.reshape(b, k), d.reshape(b, k)
