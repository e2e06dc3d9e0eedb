"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first n_devices devices.

    Default is a 1-D 'data' mesh (the only scale axis this workload has —
    batch; SURVEY.md §2.2). Pass axis_names=('data','model') and a shape
    for data+tensor-parallel layouts.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only "
            f"{len(devices)} JAX device(s) are visible; for a virtual "
            f"mesh set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices} (and JAX_PLATFORMS=cpu)"
        )
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    assert shape is not None, "shape required for multi-axis meshes"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: rows split across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
