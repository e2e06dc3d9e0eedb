"""ctypes bindings for the native components (numpy in/out)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .build import load_native_library


def hungarian_solve_native(cost: np.ndarray) -> Optional[np.ndarray]:
    """Min-cost assignment of an (n, n) cost matrix; returns row_to_col
    (n,) int array, or None if the native library is unavailable."""
    lib = load_native_library()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    assert cost.shape == (n, n)
    out = np.empty(n, dtype=np.int32)
    lib.hungarian_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out


class PackedGather:
    """Threaded batch row-gather over a packed .npy uint8 store.

    Drops the GIL for the whole batch (ctypes) so the gather overlaps
    the accelerator step. Falls back to None (caller uses numpy memmap)
    when the native library can't build.
    """

    def __init__(self, path: str, row_shape, n_rows: int):
        self._lib = load_native_library()
        self._handle = -1
        self.row_shape = tuple(row_shape)
        self.row_bytes = int(np.prod(row_shape))
        self.n_rows = n_rows
        if self._lib is not None:
            self._handle = self._lib.pl_open(
                path.encode(), self.row_bytes, n_rows
            )

    @property
    def ok(self) -> bool:
        return self._handle >= 0

    def gather(self, indices: np.ndarray) -> np.ndarray:
        assert self.ok
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx),) + self.row_shape, dtype=np.uint8)
        rc = self._lib.pl_gather(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise IndexError(f"pl_gather failed with code {rc}")
        return out

    def close(self):
        if self.ok:
            self._lib.pl_close(self._handle)
            self._handle = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
