"""InfoNCE-family contrastive losses, TPU-first.

Reference parity: /root/reference/losses.py. Semantics preserved:

  * SimCLRLoss (losses.py:162-202): dot-product InfoNCE with the positive
    appended to the negatives row before logsumexp.
  * LpSimCLRLoss (losses.py:405-477): Lp-distance InfoNCE, incl. the
    p<1 epsilon-and-transpose branch (losses.py:433-441), the optional
    p-th power (:452-454), and simclr_compatibility_mode (logsumexp incl.
    pos, :458-462) vs plain logmeanexp over negatives (:465).
  * Uniformity/Alignment (:205-239), combinators (:66-159), R2 (:480-503).

TPU design: the B×B pairwise-distance matrix is the quadratic hot object.
For p=2 it is computed on the MXU as ||x||² + ||y||² - 2·x@yᵀ; for other
p the broadcasted B×B×n intermediate is avoided by scanning row-blocks
(``block_size``) so peak memory is block×B×n. A fused Pallas kernel in
cl_ica_tpu.ops goes further and keeps the whole row-logsumexp in VMEM.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def logmeanexp(x, axis):
    """log(mean(exp(x))) — reference _logmeanexp (losses.py:506-510)."""
    n = x.shape[axis]
    return jax.scipy.special.logsumexp(x, axis=axis) - jnp.log(float(n))


def _row_block_map(fn, x, block_size: int):
    """Apply fn to row-blocks of x and concatenate. Falls back to a single
    call when B is not divisible (shapes must stay static)."""
    b = x.shape[0]
    if block_size is None or b <= block_size or b % block_size != 0:
        return fn(x)
    blocks = x.reshape(b // block_size, block_size, *x.shape[1:])
    return jax.lax.map(fn, blocks).reshape(b, -1)


def pairwise_lp_distance(
    z1,
    z3,
    p: float,
    pow_: bool = True,
    eps: float = 0.0,
    block_size: Optional[int] = 1024,
    precision="highest",
):
    """All-pairs Lp distances D[i, j] = ||z1_i - z3_j||_p (optionally ^p).

    p == 2 with pow_ rides the MXU as a single matmul; other p scan
    row-blocks to bound the broadcasted intermediate at block×B×n.
    ``eps`` is added inside the abs for the reference's p<1 numerical
    guard (losses.py:436). ``precision`` pins the matmul precision:
    'highest' (fp32 accumulate, default — the n≈10 contraction is cheap
    and distance accuracy feeds MCC parity) or None for the platform
    default (bf16 MXU passes).
    """
    if p == 2.0 and eps == 0.0:
        sq1 = jnp.sum(z1 * z1, axis=-1)
        sq3 = jnp.sum(z3 * z3, axis=-1)
        cross = jnp.matmul(z1, z3.T, precision=precision)
        d2 = jnp.maximum(sq1[:, None] + sq3[None, :] - 2.0 * cross, 0.0)
        return d2 if pow_ else jnp.sqrt(d2)

    def block_fn(z1_blk):
        diff = jnp.abs(z1_blk[:, None, :] - z3[None, :, :] + eps)
        if p == 1.0:
            return jnp.sum(diff, axis=-1)  # |.|^1 == |.|, pow_ irrelevant
        dp = jnp.sum(diff**p, axis=-1)
        return dp if pow_ else dp ** (1.0 / p)

    return _row_block_map(block_fn, z1, block_size)


class CLLoss(ABC):
    """Pos+neg pair loss protocol (losses.py:11-29). Ground-truth latents
    z1, z2_con_z1, z3 are accepted for interface parity; most losses use
    only the reconstructions."""

    @abstractmethod
    def loss(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec):
        ...

    def __call__(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec):
        return self.loss(z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec)


@dataclasses.dataclass
class SimCLRLoss(CLLoss):
    """Dot-product InfoNCE (losses.py:162-202).

    use_fused streams the B×B similarity through the Pallas kernel
    (ops.fused_dot_lse) instead of materializing it. None = auto: fused
    on TPU — measured 9.5× faster at the reference batch (B=6144:
    21.1 → 2.2 ms fwd+bwd, tools/bench_infonce_fused.py --p 0, r4) and
    the only path that runs at B=65k, where the materialized program
    fails to compile. Materialized elsewhere (CPU pallas interpret mode
    is orders slower)."""

    normalize: bool = False
    tau: float = 1.0
    alpha: float = 0.5
    use_fused: Optional[bool] = None  # None = auto (fused on TPU)

    def _fused_ok(self) -> bool:
        if self.use_fused is None:
            return jax.default_backend() == "tpu"
        return self.use_fused

    def loss(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec):
        del z1, z2_con_z1, z3
        if self.normalize:
            z1_rec = z1_rec / jnp.linalg.norm(z1_rec, axis=-1, keepdims=True)
            z2_con_z1_rec = z2_con_z1_rec / jnp.linalg.norm(
                z2_con_z1_rec, axis=-1, keepdims=True
            )
            z3_rec = z3_rec / jnp.linalg.norm(z3_rec, axis=-1, keepdims=True)

        pos = jnp.sum(z1_rec * z2_con_z1_rec, axis=-1)
        loss_pos = -pos / self.tau
        if self._fused_ok():
            from ..ops.infonce_pallas import fused_dot_lse

            lse = fused_dot_lse(z1_rec, z3_rec, self.tau)
            # pos column folded in (== appending it before logsumexp)
            loss_neg = jnp.logaddexp(lse, pos / self.tau)
        else:
            neg = jnp.matmul(z1_rec, z3_rec.T, precision="highest")  # MXU
            neg_and_pos = jnp.concatenate([neg, pos[:, None]], axis=1)
            loss_neg = jax.scipy.special.logsumexp(neg_and_pos / self.tau, axis=1)
        loss = 2 * (self.alpha * loss_pos + (1.0 - self.alpha) * loss_neg)
        return jnp.mean(loss), loss, [jnp.mean(loss_pos), jnp.mean(loss_neg)]


@dataclasses.dataclass
class LpSimCLRLoss(CLLoss):
    """Extended InfoNCE for non-normalized representations, Lp distance
    (losses.py:405-477).

    Note (parity): for p<1 the reference builds the negatives matrix
    transposed (z1.unsqueeze(0) - z3.unsqueeze(1), losses.py:436) so row i
    holds |z1_j - z3_i|; reproduced here so per-item losses match.
    """

    p: float
    tau: float = 1.0
    alpha: float = 0.5
    simclr_compatibility_mode: bool = False
    pow: bool = True
    block_size: Optional[int] = 1024
    use_fused: Optional[bool] = None  # None = auto (TPU, p>=1, pow)

    def _fused_ok(self) -> bool:
        p = float(self.p)
        eligible = p >= 1.0 and self.pow
        if self.use_fused is None:
            # auto routes every p>=1 through the Pallas kernel on TPU,
            # including p=2 since its MXU-tile variant landed: measured
            # 8.1x on the loss fwd+bwd and 1.30x e2e on the headline
            # MLP step at the reference batch 6144 (B² HBM traffic
            # eliminated — tools/bench_infonce_fused.py, EXPERIMENTS
            # r4); at B=65k the materialized path cannot even compile.
            return eligible and jax.default_backend() == "tpu"
        return self.use_fused and eligible

    def loss(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec):
        del z1, z2_con_z1, z3
        p = float(self.p)

        if self._fused_ok():
            # fused Pallas path: streaming logsumexp over the negatives
            # row; pos folded in via logaddexp (== appending the pos
            # column before logsumexp, losses.py:459-462)
            from ..ops.infonce_pallas import fused_neg_lse

            pos = jnp.sum(jnp.abs(z1_rec - z2_con_z1_rec) ** p, axis=-1)
            lse = fused_neg_lse(z1_rec, z3_rec, p, self.tau)
            loss_pos = pos / self.tau
            if self.simclr_compatibility_mode:
                loss_neg = jnp.logaddexp(lse, -pos / self.tau)
            else:
                loss_neg = lse - jnp.log(float(z3_rec.shape[0]))
            loss = 2 * (self.alpha * loss_pos + (1.0 - self.alpha) * loss_neg)
            return jnp.mean(loss), loss, [jnp.mean(loss_pos), jnp.mean(loss_neg)]

        if p < 1.0:
            neg = pairwise_lp_distance(
                z3_rec, z1_rec, p, pow_=self.pow, eps=1e-12,
                block_size=self.block_size,
            )
            pos_d = jnp.abs(z1_rec - z2_con_z1_rec) + 1e-12
            pos = jnp.sum(pos_d**p, axis=-1)
            if not self.pow:
                pos = pos ** (1.0 / p)
        else:
            neg = pairwise_lp_distance(
                z1_rec, z3_rec, p, pow_=self.pow, block_size=self.block_size
            )
            diff = jnp.abs(z1_rec - z2_con_z1_rec)
            pos = jnp.sum(diff**p, axis=-1)
            if not self.pow:
                pos = pos ** (1.0 / p)

        if self.simclr_compatibility_mode:
            neg_and_pos = jnp.concatenate([neg, pos[:, None]], axis=1)
            loss_pos = pos / self.tau
            loss_neg = jax.scipy.special.logsumexp(-neg_and_pos / self.tau, axis=1)
        else:
            loss_pos = pos / self.tau
            loss_neg = logmeanexp(-neg / self.tau, axis=1)

        loss = 2 * (self.alpha * loss_pos + (1.0 - self.alpha) * loss_neg)
        return jnp.mean(loss), loss, [jnp.mean(loss_pos), jnp.mean(loss_neg)]


class MarginalPairCLLoss(ABC):
    """Negative-pair-only loss protocol (losses.py:49-63)."""

    @abstractmethod
    def loss(self, z1_rec, z3_rec):
        ...

    def __call__(self, z1_rec, z3_rec):
        return self.loss(z1_rec, z3_rec)


class ConditionalPairCLLoss(ABC):
    """Positive-pair-only loss protocol (losses.py:32-46)."""

    @abstractmethod
    def loss(self, z1_rec, z2_con_z1_rec):
        ...

    def __call__(self, z1_rec, z2_con_z1_rec):
        return self.loss(z1_rec, z2_con_z1_rec)


class MarginalSingleCLLoss(ABC):
    """Single-input loss protocol (losses.py:253-266)."""

    @abstractmethod
    def loss(self, z1_rec):
        ...

    def __call__(self, z1_rec):
        return self.loss(z1_rec)


@dataclasses.dataclass
class UniformityLoss(MarginalPairCLLoss):
    """Negative-pair term of L2-normalized InfoNCE (losses.py:205-221)."""

    p: float = 2.0

    def loss(self, z1_rec, z3_rec):
        # deltas[i, j] = z1_j - z3_i (reference broadcast order, :213)
        deltas = jnp.abs(z1_rec[None, :, :] - z3_rec[:, None, :])
        lp = jnp.sum(deltas**self.p, axis=-1)
        loss_per_item = logmeanexp(-lp, axis=-1)
        loss = jnp.mean(loss_per_item, axis=0)
        return loss, loss_per_item, [loss]


@dataclasses.dataclass
class AlignmentLoss(ConditionalPairCLLoss):
    """Positive-pair term of L2-normalized InfoNCE (losses.py:224-239)."""

    p: float = 2.0

    def loss(self, z1_rec, z2_rec):
        delta = jnp.abs(z1_rec - z2_rec)
        lp = jnp.sum(delta**self.p, axis=-1)
        return jnp.mean(lp), lp, [jnp.mean(lp)]


class SplitCombinedCLLoss(CLLoss):
    """Apply different losses to dim-chunks of the data and combine
    (losses.py:66-151). losses_and_indices: [(loss, start, end), ...]."""

    def __init__(
        self,
        losses_and_indices: List[Tuple[object, int, int]],
        weights: Optional[Sequence[float]] = None,
    ):
        if weights is None:
            weights = [1.0] * len(losses_and_indices)
        assert len(weights) == len(losses_and_indices)
        for l in losses_and_indices:
            assert isinstance(l, (tuple, list)) and len(l) == 3
            assert isinstance(l[1], int)
            assert l[2] is None or isinstance(l[2], int)  # None = full width
        self.weights = list(weights)
        self.losses_and_indices = losses_and_indices

    def loss(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec):
        loss_values, per_item_values, individual = [], [], []
        for (l, s, e), w in zip(self.losses_and_indices, self.weights):
            c = lambda a: a[:, s:e]
            if isinstance(l, MarginalPairCLLoss):
                tl, lpi, ils = l(c(z1_rec), c(z3_rec))
            elif isinstance(l, ConditionalPairCLLoss):
                tl, lpi, ils = l(c(z1_rec), c(z2_con_z1_rec))
            elif isinstance(l, CLLoss):
                tl, lpi, ils = l(
                    c(z1), c(z2_con_z1), c(z3), c(z1_rec), c(z2_con_z1_rec), c(z3_rec)
                )
            elif isinstance(l, MarginalSingleCLLoss):
                tl, lpi, ils = l(c(z1))
            else:
                raise ValueError(f"Invalid loss type: {type(l)}")
            loss_values.append(tl)
            per_item_values.append(lpi)
            individual.append(ils)

        total = sum(w * l for l, w in zip(loss_values, self.weights))
        per_item = sum(
            w * lpi for lpi, w in zip(per_item_values, self.weights)
        )
        return total, per_item, list(zip(loss_values, individual, individual))


class CombinedCLLoss(SplitCombinedCLLoss):
    """Apply several losses to the full data (losses.py:154-159): the
    (0, None) chunk is the full width, so the parent's dispatch applies
    unchanged."""

    def __init__(self, losses, weights=None):
        super().__init__([(l, 0, None) for l in losses], weights=weights)


@dataclasses.dataclass
class AlignmentUniformityLoss(CLLoss):
    """Convex combination of Alignment and Uniformity (losses.py:242-250)."""

    alpha: float = 0.5
    p: float = 2.0

    def __post_init__(self):
        assert 0 <= self.alpha <= 1
        self._combined = CombinedCLLoss(
            [AlignmentLoss(p=self.p), UniformityLoss(p=self.p)],
            [1.0 - self.alpha, self.alpha],
        )

    def loss(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec):
        return self._combined.loss(z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec)


class JacobianDeterminantLoss(MarginalSingleCLLoss):
    """Mean |det J_h(z)| objective (losses.py:269-286); vmap'd jacfwd
    instead of the reference's full-batch autograd jacobian."""

    def __init__(self, h):
        self.h = h

    def loss(self, z1):
        assert z1.ndim == 2
        jac = jax.vmap(jax.jacfwd(lambda z: self.h(z[None, :])[0]))(z1)
        det = jnp.abs(jnp.linalg.det(jac))
        loss = jnp.mean(det)
        return loss, jnp.full((z1.shape[0],), jnp.nan), [loss]


@dataclasses.dataclass
class R2Loss:
    """(Negative) R² score (losses.py:480-503)."""

    reduction: str = "none"
    mode: str = "negative_r2"

    def __post_init__(self):
        assert self.mode in ("negative_r2", "r2")

    def __call__(self, y_pred, y):
        var_y = jnp.var(y, axis=0)  # biased, like torch.var(unbiased=False)
        r2 = 1.0 - jnp.mean((y_pred - y) ** 2, axis=0) / var_y
        if self.reduction == "mean":
            r2 = jnp.mean(r2)
        elif self.reduction == "sum":
            r2 = jnp.sum(r2)
        return r2 if self.mode == "r2" else -r2
