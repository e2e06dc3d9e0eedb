"""Pallas TPU kernels — the native compute path.

These replace the reference's reliance on external native libraries
(SURVEY.md §2.4): cuBLAS/cuDNN kernels inside torch for the loss math,
and FAISS's C++/OpenMP k-NN for the 3DIdent pair matcher.

- infonce_pallas: fused Lp-InfoNCE negative-logsumexp. Streams the B×B
  pairwise-distance matrix through VMEM tiles with an online
  (flash-attention-style) logsumexp — the quadratic object never touches
  HBM. Custom VJP with two accumulation kernels (row-grads, col-grads).
- knn: batched exact top-k L2 over the rendered-latent table (FAISS
  IndexFlatL2 replacement), jitted matmul + windowed top-k.
"""

from .infonce_pallas import fused_dot_lse, fused_neg_lse, pallas_available
from .knn import l2_topk

__all__ = ["fused_neg_lse", "fused_dot_lse", "pallas_available", "l2_topk"]
