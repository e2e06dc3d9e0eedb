"""Identifiability metrics: MCC, linear R², Hungarian assignment.

Reference parity: disentanglement_utils.py, munkres.py,
kitti_masks/mcc_metric/metric.py.
"""

from .munkres import Munkres, hungarian
from .disentanglement import (
    linear_disentanglement,
    permutation_disentanglement,
    r2_score,
)
from .mcc import compute_mcc, correlation
from .dislib_metrics import compute_mig, compute_sap

__all__ = [
    "Munkres",
    "hungarian",
    "linear_disentanglement",
    "permutation_disentanglement",
    "r2_score",
    "compute_mcc",
    "correlation",
    "compute_mig",
    "compute_sap",
]
