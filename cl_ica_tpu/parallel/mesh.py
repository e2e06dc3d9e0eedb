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


def make_dp_tp_mesh(n_devices: int, model: int = 0):
    """The drivers' mesh layout: a 1-D 'data' mesh, or a 2-D
    (data, model) mesh when model > 1 (the --mesh/--mesh-model pair).

    Returns (mesh, n_data) where n_data is the data-axis size callers
    must check batch divisibility against. Divisibility of n_devices by
    model is the caller's contract (the CLIs guard it with a clear
    SystemExit at parse time)."""
    model = model if model and model > 1 else 0
    if model:
        assert n_devices % model == 0, (n_devices, model)
        n_data = n_devices // model
        return (
            make_mesh(n_devices, axis_names=("data", "model"),
                      shape=(n_data, model)),
            n_data,
        )
    return make_mesh(n_devices), n_devices


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: rows split across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
