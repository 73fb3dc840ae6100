"""Host-side ragged <-> padded conversions.

The reference engine works on ragged per-halo blocks addressed by
``region_offsets`` (``/root/reference/orbitanalysis/track_orbits.py:129-132``).
On TPU everything under ``jit`` needs static shapes, so the framework's
device-resident state is a padded ``[n_halos, capacity]`` layout with an
invalid-ID sentinel in unused slots.  These helpers do the (vectorized,
zero-Python-loop) host-side packing of loader output into that layout and
the reverse compaction of event masks back into ragged catalogs.

Slot order within each halo row preserves the loader's particle order, so
compacted outputs reproduce the reference's within-halo ordering exactly.
"""

from __future__ import annotations

import numpy as np

#: Sentinel stored in unused ID slots.  Chosen as the dtype max so that a
#: plain ascending sort pushes padding to the end of each row.
INVALID_ID = np.iinfo(np.int32).max


def invalid_id_for(dtype) -> int:
    """The invalid-slot sentinel for a given integer dtype (its max value)."""
    return int(np.iinfo(np.dtype(dtype)).max)


def round_up_pow2(n: int) -> int:
    """Round ``n`` up to a power of two (bitonic-network row lengths)."""
    if n <= 1:
        return 1
    return 1 << (int(n) - 1).bit_length()


def round_up(n: int, multiple: int = 128) -> int:
    """Round ``n`` up to a multiple (TPU lane dimension is 128)."""
    if n <= 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


def _row_col(lengths: np.ndarray, rows: np.ndarray):
    """Flat (row, col) scatter indices for ragged blocks of ``lengths``
    placed at the given target rows, columns starting at 0."""
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    reprow = np.repeat(rows, lengths)
    col = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(starts, lengths)
    return reprow, col


def pack_ragged(
    values: np.ndarray,
    offsets: np.ndarray,
    n_rows: int,
    capacity: int,
    rows: np.ndarray | None = None,
    fill=0,
    dtype=None,
) -> np.ndarray:
    """Pack ragged blocks into a padded ``[n_rows, capacity, ...]`` array.

    ``values`` is the concatenated block data (shape ``[N]`` or ``[N, d]``),
    ``offsets`` the start index of each block (reference's
    ``region_offsets`` convention, ``track_orbits.py:52-54``), ``rows`` the
    target row index of each block (defaults to 0..n_blocks-1).  Unused
    slots are set to ``fill``.
    """
    values = np.asarray(values)
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.diff(np.concatenate((offsets, [len(values)])))
    if rows is None:
        rows = np.arange(len(lengths), dtype=np.int64)
    else:
        rows = np.asarray(rows, dtype=np.int64)
    if lengths.size and int(lengths.max(initial=0)) > capacity:
        raise ValueError(
            f"region of {int(lengths.max())} particles exceeds capacity "
            f"{capacity}; increase capacity/headroom"
        )
    if (dtype is None or np.dtype(dtype) == values.dtype) and (
        values.nbytes >= (1 << 20)
    ):
        # large snapshots: the multithreaded native packer (g++/OpenMP,
        # built on first use; see orbitanalysis_tpu/native)
        from orbitanalysis_tpu import native

        if native.ensure() is not None:
            out = native.pack_ragged_native(
                values, offsets, n_rows, capacity, rows, fill
            )
            if out is not None:
                return out
    out_shape = (n_rows, capacity) + values.shape[1:]
    # calloc (np.zeros) + fill rather than np.full: numpy madvises
    # MADV_HUGEPAGE on large malloc'd blocks and first-touch can enter
    # THP direct compaction (measured 13-21 ms/MB vs 0.4-0.6); the fill
    # pass writes every byte either way
    out = np.zeros(out_shape, dtype=dtype or values.dtype)
    if np.any(np.asarray(fill) != 0):
        out.fill(fill)
    reprow, col = _row_col(lengths, rows)
    out[reprow, col] = values
    return out


def pack_ragged_to(
    out: np.ndarray,
    values: np.ndarray,
    offsets: np.ndarray,
    rows: np.ndarray | None = None,
    fill=0,
) -> np.ndarray:
    """Like :func:`pack_ragged` but writes into a preallocated buffer."""
    values = np.asarray(values)
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.diff(np.concatenate((offsets, [len(values)])))
    if rows is None:
        rows = np.arange(len(lengths), dtype=np.int64)
    out[...] = fill
    reprow, col = _row_col(lengths, np.asarray(rows, dtype=np.int64))
    out[reprow, col] = values
    return out


def unpack_mask(mask: np.ndarray, *arrays: np.ndarray, rows: np.ndarray | None = None):
    """Compact padded per-row data selected by a boolean ``[R, C]`` mask.

    Returns ``(offsets, *compacted)`` where ``offsets`` has ``len(rows)+1``
    entries (cumulative counts per selected row, reference's apsis-offsets
    convention at ``track_orbits.py:214-216``) and each compacted array is
    the row-major concatenation of the masked elements — i.e. per-halo
    blocks in slot order.
    """
    mask = np.asarray(mask, dtype=bool)
    if rows is not None:
        rows = np.asarray(rows, dtype=np.int64)
        mask_sel = mask[rows]
        counts = mask_sel.sum(axis=1)
        flat_sel = mask_sel.reshape(-1)
        compacted = [np.asarray(a)[rows].reshape((flat_sel.size,) + np.asarray(a).shape[2:])[flat_sel] for a in arrays]
    else:
        counts = mask.sum(axis=1)
        flat_sel = mask.reshape(-1)
        compacted = [np.asarray(a).reshape((flat_sel.size,) + np.asarray(a).shape[2:])[flat_sel] for a in arrays]
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return (offsets,) + tuple(compacted)
