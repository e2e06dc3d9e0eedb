"""Native (C++) runtime components, bound via ctypes.

The reference outsources native work to external libraries (FAISS,
torch, disentanglement_lib — SURVEY.md §2.4); here the first-party
native pieces are:

  hungarian.cpp     — O(n³) assignment solver (Python munkres.py
                      replacement on the MCC eval path)
  packed_loader.cpp — threaded mmap batch gatherer for the packed image
                      store (DataLoader-worker replacement on the
                      3DIdent input path)

Build is on-demand (g++ -O2 -shared) with the result cached next to the
sources; every caller has a pure-Python fallback, so the framework works
without a toolchain.
"""

from .build import load_native_library, native_available
from .bindings import hungarian_solve_native, PackedGather

__all__ = [
    "load_native_library",
    "native_available",
    "hungarian_solve_native",
    "PackedGather",
]
