"""Shared training runtime.

The reference has no trainer abstraction — each CLI re-implements its
loop (SURVEY.md §1: main_mlp.py:258-285, main_3dident.py:402-566,
kitti_masks/solver.py:52-96). Here one jitted step serves all three:
encode -> roll-negatives -> loss -> optax update, with optional
on-device data synthesis (the MLP path samples latents inside the same
XLA program) and a single Orbax-based checkpoint manager
(params + opt state + step + RNG key) replacing the reference's three
ad-hoc torch.save schemes (SURVEY.md §5).
"""

from .state import TrainState
from .trainer import (
    make_synthetic_train_step,
    make_scanned_synthetic_train_steps,
    make_ensemble_synthetic_train_steps,
    make_data_train_step,
    Throughput,
)
from .checkpoint import CheckpointManager
from .metrics import MetricsLogger

__all__ = [
    "TrainState",
    "make_synthetic_train_step",
    "make_scanned_synthetic_train_steps",
    "make_ensemble_synthetic_train_steps",
    "make_data_train_step",
    "Throughput",
    "CheckpointManager",
    "MetricsLogger",
]
