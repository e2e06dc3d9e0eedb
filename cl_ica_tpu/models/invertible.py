"""Frozen invertible mixing networks g: z -> x.

Reference parity: /root/reference/invertible_network_utils.py:15-123.
Weight init semantics preserved exactly:
  * "pcl": draw U(-1,1) matrices, column-L2-normalize, reject by
    condition number against a threshold estimated from a pool of
    n_iter_cond_thresh draws (invertible_network_utils.py:77-102).
  * "rvs": scipy.stats.ortho_group orthogonal matrices.
Init is host-side numpy (one-time, like the reference); the forward pass
is a pure jittable function of frozen jnp weights — on TPU the mixing
fuses into the same XLA program as the encoder and loss.
"""

from __future__ import annotations

from typing import List, Literal, Union

import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from .layers import smooth_leaky_relu
import flax.linen as nn


_ACTS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
    "elu": lambda x: nn.elu(x, alpha=1.0),
    "smooth_leaky_relu": lambda x: smooth_leaky_relu(x, alpha=0.2),
    "softplus": lambda x: nn.softplus(x),
}


def apply_mixing_weights(weights, x, act_name: str):
    """Functional forward of an InvertibleMLP given its weight tuple.

    Pure function of (weights, x) so it can be vmapped over a stacked
    leading seed axis (see stack_mixings) — the ensemble trainer maps
    per-seed frozen mixings through one XLA program."""
    act = _ACTS[act_name]
    for i, w in enumerate(weights):
        x = x @ w.T
        if i < len(weights) - 1:
            x = act(x)
    return x


class InvertibleMLP:
    """Frozen n→n MLP mixing. Callable on (B, n) arrays; jit-safe.

    Weights are stored as a tuple of (n, n) jnp arrays applied as
    x @ W.T (torch Linear convention, bias-free as in the reference).
    """

    def __init__(self, weights: List[np.ndarray], act: str):
        self.weights = tuple(jnp.asarray(w, dtype=jnp.float32) for w in weights)
        self.act_name = act

    def __call__(self, x):
        return apply_mixing_weights(self.weights, x, self.act_name)

    @property
    def n_layers(self) -> int:
        return len(self.weights)


def stack_mixings(gs: List["InvertibleMLP"]):
    """Stack S frozen mixings into one pytree with a leading (S,) axis.

    Returns (stacked_weights, apply_fn) where apply_fn(weights_i, x)
    reproduces gs[i](x) when given lane i's slice — the contract
    jax.vmap needs to run per-seed mixings inside the ensemble step.
    All mixings must share depth and activation."""
    acts = {g.act_name for g in gs}
    depths = {g.n_layers for g in gs}
    if len(acts) != 1 or len(depths) != 1:
        raise ValueError("stack_mixings requires equal depth and activation")
    act_name = acts.pop()
    stacked = tuple(
        jnp.stack([g.weights[l] for g in gs]) for l in range(depths.pop())
    )
    return stacked, lambda w, x: apply_mixing_weights(w, x, act_name)


def _l2_normalize_columns(a: np.ndarray) -> np.ndarray:
    return a / np.sqrt(np.sum(a * a, axis=0))


def construct_invertible_mlp(
    n: int = 20,
    n_layers: int = 2,
    n_iter_cond_thresh: int = 10000,
    cond_thresh_ratio: float = 0.25,
    weight_matrix_init: Union[Literal["pcl"], Literal["rvs"]] = "pcl",
    act_fct: str = "leaky_relu",
    rng: np.random.Generator | None = None,
) -> InvertibleMLP:
    """Create an (approximately) invertible frozen mixing MLP.

    Semantics match invertible_network_utils.construct_invertible_mlp:
    condition-number rejection keeps each layer well-conditioned so g is
    approximately invertible. Pure numpy at setup (one-time cost); note
    cond_thresh_ratio=0.0 (the main_mlp.py:206 setting) selects the
    minimum condition number seen in the pool.
    """
    if act_fct not in _ACTS:
        raise ValueError(f"activation function {act_fct} not defined")
    rng = rng or np.random.default_rng()

    weights: List[np.ndarray] = []
    if weight_matrix_init == "pcl":
        # Batched SVD replaces the reference's 25k-iteration Python loop
        # (invertible_network_utils.py:79-83) — same distribution of
        # condition numbers, ~100x faster pool construction.
        def batched_conds(k: int) -> tuple[np.ndarray, np.ndarray]:
            a = rng.uniform(-1, 1, (k, n, n))
            a = a / np.sqrt(np.sum(a * a, axis=1, keepdims=True))
            s = np.linalg.svd(a, compute_uv=False)
            return a, s[:, 0] / s[:, -1]

        _, cond_list = batched_conds(n_iter_cond_thresh)
        cond_list.sort()
        cond_thresh = cond_list[int(n_iter_cond_thresh * cond_thresh_ratio)]
        for _ in range(n_layers):
            while True:
                cands, conds = batched_conds(256)
                ok = np.flatnonzero(conds <= cond_thresh)
                if len(ok):
                    weights.append(cands[ok[0]].astype(np.float32))
                    break
    elif weight_matrix_init == "rvs":
        for _ in range(n_layers):
            weights.append(ortho_group.rvs(n, random_state=rng).astype(np.float32))
    else:
        raise ValueError(f"weight matrix init {weight_matrix_init} not implemented")

    return InvertibleMLP(weights, act_fct)
