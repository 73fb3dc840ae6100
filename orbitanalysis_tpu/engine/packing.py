"""Host-side snapshot packing: loader dicts -> padded device batches.

The data contract is the reference's two-callback interface
(``/root/reference/orbitanalysis/track_orbits.py:27-61``): the loader
returns concatenated per-region blocks plus ``region_offsets``.  This
module turns that ragged layout into the engine's static-shape
``[n_halos, capacity]`` arrays (fully vectorized NumPy scatters — no
Python loop over halos, unlike the reference's per-halo closure at
``track_orbits.py:147-185``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from orbitanalysis_tpu.utils.padding import invalid_id_for, pack_ragged, round_up


class PackedSnapshot(NamedTuple):
    ids: np.ndarray                 # [H, P]
    pos: np.ndarray                 # [H, P, 3]
    vel: np.ndarray                 # [H, P, 3]
    mass: Optional[np.ndarray]      # [H, P] or None (scalar masses)
    center: np.ndarray              # [H, 3]
    bulk_vel: Optional[np.ndarray]  # [H, 3] or None
    lengths: np.ndarray             # [H] particles per halo row
    rows: np.ndarray                # active halo rows (indices into H)
    # with sort_ids: rows are ID-sorted and slot[h, i] is the load-order
    # slot the i-th (sorted) entry came from
    slot: Optional[np.ndarray] = None  # [H, P] int32 or None


def required_capacity(lengths, headroom: float = 1.3, multiple: int = 128) -> int:
    """Capacity for the padded particle axis: max region size with
    headroom for later growth, rounded up to the TPU lane multiple."""
    mx = int(np.max(lengths, initial=0))
    return round_up(int(np.ceil(mx * headroom)), multiple)


def pack_snapshot(
    snapshot: dict,
    rows: np.ndarray,
    n_halos: int,
    capacity: int,
    region_positions: np.ndarray,
    region_bulk_vels: Optional[np.ndarray] = None,
    id_dtype=np.int32,
    pos_dtype=np.float32,
    sort_ids: bool = False,
) -> PackedSnapshot:
    """Pack one loader snapshot dict into padded arrays.

    ``rows`` maps each region block to its global halo row (the engine
    keeps one row per main-branch halo for the whole run so carried state
    stays aligned as halos are born).
    """
    ids = np.asarray(snapshot["ids"])
    offsets = np.asarray(snapshot["region_offsets"], dtype=np.int64)
    n = len(ids)
    lengths_blocks = np.diff(np.concatenate((offsets, [n])))
    invalid = invalid_id_for(id_dtype)

    if np.issubdtype(ids.dtype, np.integer) and ids.size:
        if ids.min(initial=0) < 0:
            # the join packs ids into unsigned sort keys ((id << 1) |
            # side) and -1 aliases the padding sentinel — a negative ID
            # would silently drop from matching, so fail loudly
            raise ValueError(
                "negative particle IDs are not supported (the sort-merge "
                "join packs IDs into unsigned keys); remap IDs to >= 0 "
                "in the loader"
            )
        if ids.max(initial=0) >= invalid:
            raise ValueError(
                f"particle IDs exceed {np.dtype(id_dtype)} range; pass a wider "
                "id_dtype (e.g. np.int64) to track_orbits"
            )

    packed_ids = pack_ragged(
        ids.astype(id_dtype), offsets, n_halos, capacity, rows=rows, fill=invalid
    )
    packed_pos = pack_ragged(
        np.asarray(snapshot["coordinates"], dtype=pos_dtype),
        offsets, n_halos, capacity, rows=rows, fill=0.0,
    )
    packed_vel = pack_ragged(
        np.asarray(snapshot["velocities"], dtype=pos_dtype),
        offsets, n_halos, capacity, rows=rows, fill=0.0,
    )

    masses = snapshot.get("masses")
    if masses is None or np.isscalar(masses) or np.ndim(masses) == 0:
        packed_mass = None  # equal masses: plain mean (track_orbits.py:279-280)
    else:
        packed_mass = pack_ragged(
            np.asarray(masses, dtype=pos_dtype),
            offsets, n_halos, capacity, rows=rows, fill=0.0,
        )

    center = np.zeros((n_halos, 3), dtype=pos_dtype)
    center[rows] = np.atleast_2d(np.asarray(region_positions, dtype=pos_dtype))

    bulk = None
    if region_bulk_vels is not None:
        bulk = np.zeros((n_halos, 3), dtype=pos_dtype)
        bulk[rows] = np.atleast_2d(np.asarray(region_bulk_vels, dtype=pos_dtype))

    lengths = np.zeros(n_halos, dtype=np.int64)
    lengths[rows] = lengths_blocks

    slot = None
    if sort_ids:
        # ID-sorted staging for the sorted-carry engine: the padding
        # sentinel is the dtype max so it stays at the row tails
        order = np.argsort(packed_ids, axis=-1, kind="stable")
        packed_ids = np.take_along_axis(packed_ids, order, axis=-1)
        packed_pos = np.take_along_axis(
            packed_pos, order[..., None], axis=-2
        )
        packed_vel = np.take_along_axis(
            packed_vel, order[..., None], axis=-2
        )
        if packed_mass is not None:
            packed_mass = np.take_along_axis(packed_mass, order, axis=-1)
        slot = order.astype(np.int32)

    return PackedSnapshot(
        ids=packed_ids,
        pos=packed_pos,
        vel=packed_vel,
        mass=packed_mass,
        center=center,
        bulk_vel=bulk,
        lengths=lengths,
        rows=np.asarray(rows),
        slot=slot,
    )
