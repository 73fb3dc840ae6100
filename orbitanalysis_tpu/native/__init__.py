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
            if not hasattr(lib, "stable_align_seq1"):
                # stale prebuilt library from before the newest symbol
                # was added (the .so is gitignored, so it survives
                # source updates) — rebuild in place once and reload;
                # cache failure so a broken toolchain doesn't re-run
                # g++ on every call
                if not _compile():
                    _load_failed = True
                    return None
                lib = ctypes.CDLL(_SO)
                if not hasattr(lib, "stable_align_seq1"):
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
            lib.stable_align5.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.stable_align5.restype = ctypes.c_int64
            lib.stable_align_seq1.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.stable_align_seq1.restype = ctypes.c_int64
            lib.stable_align3.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.stable_align3.restype = ctypes.c_int64
            lib.stable_align3_i64.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.stable_align3_i64.restype = ctypes.c_int64
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
    lib = ensure()
    if lib is None:
        return None
    values = np.ascontiguousarray(values)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    elem = int(np.prod(values.shape[1:], dtype=np.int64))
    elem_bytes = elem * values.dtype.itemsize

    out_shape = (n_rows, capacity) + values.shape[1:]
    # np.zeros (calloc) before the sentinel fill: numpy madvises
    # MADV_HUGEPAGE on large malloc'd blocks and first-touch can enter
    # THP direct compaction (measured 13-21 ms/MB vs 0.4-0.6 for the
    # calloc path); the fill writes every byte either way
    if (
        values.dtype == np.int32
        and elem == 1
        and np.asarray(fill).dtype.kind in "iu"
    ):
        out = np.zeros(out_shape, dtype=values.dtype)
        lib.fill_i32(
            out.ctypes.data, out.size, ctypes.c_int32(int(fill))
        )
    else:
        out = np.zeros(out_shape, dtype=values.dtype)
        if np.any(np.asarray(fill) != 0):
            out.fill(fill)
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


def stable_align_native(
    layout: np.ndarray,
    ids: np.ndarray,
    pos: np.ndarray,
    vel: np.ndarray,
    mass: np.ndarray | None,
    invalid: int,
    out=None,
    soa: bool = False,
):
    """Native counterpart of the stable-layout alignment in
    :func:`orbitanalysis_tpu.engine.packing.align_packed` (match +
    entrant placement + scatter in one multithreaded pass, updating
    ``layout`` in place).  Returns ``(ids_o, pos_o, vel_o, mass_o,
    slot)`` or None when the native library is unavailable or the
    dtypes aren't the i32/f32 (or i64-ID/f32) fast path.  Raises
    ValueError on layout overflow (entrants exceed free positions),
    like the NumPy path.

    ``soa=True`` emits ``pos_o``/``vel_o`` as ``[3, H, P]`` coordinate
    planes (the device engine's staged layout) instead of ``[H, P, 3]``.
    ``out=(ids_o, pos_o, vel_o, mass_o, slot)`` scatters into
    caller-provided buffers — persistent staging buffers avoid the
    per-snapshot mmap/page-fault churn of fresh allocations (measured
    5-10x swings on the staging loop at 2M-row snapshots); each buffer
    must be C-contiguous with the exact shape/dtype, and ``mass_o``
    must be None iff ``mass`` is None.
    """
    lib = ensure()
    if lib is None:
        return None
    id_dt = np.dtype(ids.dtype)
    if (
        id_dt not in (np.dtype(np.int32), np.dtype(np.int64))
        or layout.dtype != id_dt
        or pos.dtype != np.float32
        or vel.dtype != np.float32
        or (mass is not None and mass.dtype != np.float32)
    ):
        return None
    align_fn = (
        lib.stable_align5 if id_dt == np.dtype(np.int32)
        else lib.stable_align3_i64
    )
    inv_c = (
        ctypes.c_int32(int(invalid)) if id_dt == np.dtype(np.int32)
        else ctypes.c_int64(int(invalid))
    )
    H, P = ids.shape
    if not (
        layout.flags.c_contiguous
        and layout.shape == (H, P)
        and pos.shape == (H, P, 3)
        and vel.shape == (H, P, 3)
    ):
        return None
    ids = np.ascontiguousarray(ids)
    pos = np.ascontiguousarray(pos)
    vel = np.ascontiguousarray(vel)
    mass = None if mass is None else np.ascontiguousarray(mass)
    vshape = (3, H, P) if soa else (H, P, 3)
    if out is not None:
        ids_o, pos_o, vel_o, mass_o, slot = out
        for a, shape, dt in (
            (ids_o, (H, P), id_dt),
            (pos_o, vshape, np.float32),
            (vel_o, vshape, np.float32),
            (slot, (H, P), np.int32),
        ):
            if a.shape != shape or a.dtype != dt or not a.flags.c_contiguous:
                raise ValueError(
                    f"stable_align_native out buffer: want C-contiguous "
                    f"{shape} {np.dtype(dt)}, got {a.shape} {a.dtype}"
                )
        if (mass is None) != (mass_o is None):
            raise ValueError(
                "stable_align_native: mass_o must be provided iff mass is"
            )
        if mass_o is not None and (
            mass_o.shape != (H, P)
            or mass_o.dtype != np.float32
            or not mass_o.flags.c_contiguous
        ):
            raise ValueError(
                "stable_align_native out buffer: mass_o must be "
                f"C-contiguous ({H}, {P}) float32"
            )
    else:
        # np.zeros (calloc) rather than np.empty: numpy madvises
        # MADV_HUGEPAGE on large malloc'd blocks and first-touch can
        # enter THP direct compaction (measured 13-21 ms/MB on a
        # fragmented host, ~30x the calloc fault path); the kernel
        # writes every byte anyway
        ids_o = np.zeros(ids.shape, ids.dtype)
        pos_o = np.zeros(vshape, np.float32)
        vel_o = np.zeros(vshape, np.float32)
        mass_o = None if mass is None else np.zeros(mass.shape, mass.dtype)
        slot = np.zeros((H, P), np.int32)
    overflowed = align_fn(
        layout.ctypes.data, ids.ctypes.data, pos.ctypes.data,
        vel.ctypes.data,
        None if mass is None else mass.ctypes.data,
        H, P, inv_c, ids_o.ctypes.data,
        pos_o.ctypes.data, vel_o.ctypes.data,
        None if mass_o is None else mass_o.ctypes.data,
        slot.ctypes.data, ctypes.c_int32(1 if soa else 0),
    )
    if overflowed:
        raise ValueError("stable layout overflow: grow capacity first")
    return ids_o, pos_o, vel_o, mass_o, slot


def stable_align_seq_native(
    layout: np.ndarray,
    ids: np.ndarray,
    pos: np.ndarray,
    vel: np.ndarray,
    mass: np.ndarray | None,
    invalid: int,
    out,
    soa: bool = False,
):
    """Whole-sequence stable-layout alignment: ``ids [S, H, P]``,
    ``pos``/``vel`` ``[S, H, P, 3]`` load order, outputs written into
    the caller's ``out=(ids_o, pos_o, vel_o, mass_o, slot)`` stacked
    buffers (``pos_o``/``vel_o`` ``[S, 3, H, P]`` when ``soa``).  Rows
    run h-major in C++ so each halo row's hash table persists across
    the S snapshots and updates incrementally (~2 x churn operations
    per row instead of a full rebuild) — the sequence-staging fast path
    behind :func:`orbitanalysis_tpu.engine.packing.stage_batch_aligned`.
    Returns the out tuple, or None when unavailable (caller falls back
    to per-snapshot :func:`stable_align_native` / NumPy).  Raises
    ValueError on layout overflow.
    """
    lib = ensure()
    if lib is None:
        return None
    if (
        np.dtype(ids.dtype) != np.dtype(np.int32)
        or layout.dtype != np.int32
        or pos.dtype != np.float32
        or vel.dtype != np.float32
        or (mass is not None and mass.dtype != np.float32)
    ):
        return None
    S, H, P = ids.shape
    if not (
        layout.flags.c_contiguous
        and layout.shape == (H, P)
        and pos.shape == (S, H, P, 3)
        and vel.shape == (S, H, P, 3)
    ):
        return None
    ids = np.ascontiguousarray(ids)
    pos = np.ascontiguousarray(pos)
    vel = np.ascontiguousarray(vel)
    mass = None if mass is None else np.ascontiguousarray(mass)
    ids_o, pos_o, vel_o, mass_o, slot = out
    vshape = (S, 3, H, P) if soa else (S, H, P, 3)
    for a, shape, dt in (
        (ids_o, (S, H, P), np.dtype(np.int32)),
        (pos_o, vshape, np.float32),
        (vel_o, vshape, np.float32),
        (slot, (S, H, P), np.int32),
    ):
        if a.shape != shape or a.dtype != dt or not a.flags.c_contiguous:
            raise ValueError(
                f"stable_align_seq_native out buffer: want C-contiguous "
                f"{shape} {np.dtype(dt)}, got {a.shape} {a.dtype}"
            )
    if (mass is None) != (mass_o is None):
        raise ValueError(
            "stable_align_seq_native: mass_o must be provided iff mass is"
        )
    overflowed = lib.stable_align_seq1(
        layout.ctypes.data, ids.ctypes.data, pos.ctypes.data,
        vel.ctypes.data,
        None if mass is None else mass.ctypes.data,
        S, H, P, ctypes.c_int32(int(invalid)), ids_o.ctypes.data,
        pos_o.ctypes.data, vel_o.ctypes.data,
        None if mass_o is None else mass_o.ctypes.data,
        slot.ctypes.data, ctypes.c_int32(1 if soa else 0),
    )
    if overflowed:
        raise ValueError("stable layout overflow: grow capacity first")
    return out


def grid_count_sort_native(flat: np.ndarray, n_cells: int):
    """Stable counting sort of cell keys: ``(cell_starts, order)`` like
    ``np.searchsorted(sorted, arange)`` + ``np.argsort(kind='stable')``
    — or None when the native library is unavailable."""
    lib = ensure()
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
