"""Contrastive losses (InfoNCE family) — reference parity: losses.py.

Every loss returns (mean_loss, per_item_loss, [component_means]), the
reference's tuple protocol (losses.py:11-29). All losses are pure
functions of jnp arrays and jit/grad/vmap-safe; the hot B×B pairwise
path has an MXU matmul fast path (p=2) and a fused Pallas kernel
(cl_ica_tpu.ops.lp_infonce) that never materializes B×B×n in HBM.
"""

from .slowvae import SlowVAELoss
from .infonce import (
    CLLoss,
    SimCLRLoss,
    LpSimCLRLoss,
    UniformityLoss,
    AlignmentLoss,
    AlignmentUniformityLoss,
    JacobianDeterminantLoss,
    SplitCombinedCLLoss,
    CombinedCLLoss,
    R2Loss,
    logmeanexp,
    pairwise_lp_distance,
)

__all__ = [
    "CLLoss",
    "SimCLRLoss",
    "LpSimCLRLoss",
    "UniformityLoss",
    "AlignmentLoss",
    "AlignmentUniformityLoss",
    "JacobianDeterminantLoss",
    "SplitCombinedCLLoss",
    "CombinedCLLoss",
    "R2Loss",
    "logmeanexp",
    "pairwise_lp_distance",
    "SlowVAELoss",
]
