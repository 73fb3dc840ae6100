"""Native (C++) host runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; this package holds the *host-side*
native tier: the multithreaded ragged-block packer feeding the device
engine (see ``packing.cpp``).  Everything here is optional — pure-NumPy
fallbacks exist in :mod:`orbitanalysis_tpu.utils.padding` — so the
framework works without a compiler; :func:`build` compiles the shared
library on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_packing.so")
_SRC = os.path.join(_DIR, "packing.cpp")
_lock = threading.Lock()
_lib = None


def _compile() -> bool:
    """Run g++ on the source (caller holds ``_lock``)."""
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared",
                "-fPIC", _SRC, "-o", _SO + ".tmp",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def build(force: bool = False) -> bool:
    """Compile the native packer (g++ -O3 -fopenmp).  Returns success."""
    with _lock:
        if os.path.exists(_SO) and not force:
            return True
        return _compile()


_load_failed = False


def load():
    """The ctypes library handle, or None if unavailable/unbuilt."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or not os.path.exists(_SO):
        return None
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_SO)
            if not hasattr(lib, "grid_count_sort"):
                # stale prebuilt library from before the symbol was
                # added (the .so is gitignored, so it survives source
                # updates) — rebuild in place once and reload; cache
                # failure so a broken toolchain doesn't re-run g++ on
                # every call
                if not _compile():
                    _load_failed = True
                    return None
                lib = ctypes.CDLL(_SO)
                if not hasattr(lib, "grid_count_sort"):
                    _load_failed = True
                    return None
            lib.pack_ragged_bytes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.pack_ragged_bytes.restype = None
            lib.fill_i32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ]
            lib.fill_i32.restype = None
            lib.grid_count_sort.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.grid_count_sort.restype = None
            _lib = lib
    return _lib


_tried_build = False


def ensure():
    """Load, building on first use if needed.  Returns lib or None."""
    global _tried_build
    lib = load()
    if lib is not None:
        return lib
    if _tried_build:
        return None
    _tried_build = True
    build()
    return load()


def available() -> bool:
    return load() is not None


def pack_ragged_native(
    values: np.ndarray,
    offsets: np.ndarray,
    n_rows: int,
    capacity: int,
    rows: np.ndarray,
    fill,
) -> np.ndarray | None:
    """Native counterpart of :func:`utils.padding.pack_ragged`.

    Returns None when the native library is unavailable or the input is
    not a case it handles (the caller then uses the NumPy path).
    """
    lib = load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    elem = int(np.prod(values.shape[1:], dtype=np.int64))
    elem_bytes = elem * values.dtype.itemsize

    out_shape = (n_rows, capacity) + values.shape[1:]
    if (
        values.dtype == np.int32
        and elem == 1
        and np.asarray(fill).dtype.kind in "iu"
    ):
        out = np.empty(out_shape, dtype=values.dtype)
        lib.fill_i32(
            out.ctypes.data, out.size, ctypes.c_int32(int(fill))
        )
    else:
        out = np.full(out_shape, fill, dtype=values.dtype)
    lib.pack_ragged_bytes(
        values.ctypes.data,
        offsets.ctypes.data,
        len(offsets),
        len(values),
        rows.ctypes.data,
        out.ctypes.data,
        capacity,
        elem_bytes,
    )
    return out


def grid_count_sort_native(flat: np.ndarray, n_cells: int):
    """Stable counting sort of cell keys: ``(cell_starts, order)`` like
    ``np.searchsorted(sorted, arange)`` + ``np.argsort(kind='stable')``
    — or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    starts = np.empty(n_cells + 1, dtype=np.int64)
    order = np.empty(len(flat), dtype=np.int64)
    lib.grid_count_sort(
        flat.ctypes.data, len(flat), int(n_cells),
        starts.ctypes.data, order.ctypes.data,
    )
    return starts, order
