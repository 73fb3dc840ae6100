"""On-the-fly orbit tracking: one snapshot pair per call.

TPU-native counterpart of
``/root/reference/orbitanalysis/track_orbits_onthefly.py:8-58``: stateless
across calls (designed to be invoked from inside a running simulation),
processes exactly the pair ``(snapshot_number, snapshot_number - 1)`` and
writes one HDF5 file per snapshot with the reference's on-the-fly schema
(``track_orbits_onthefly.py:229-249``): apsis/entered/departed ID sets
with per-halo offsets over the *full* halo list (−1-padded progenitor
links), per-pair angle changes, and region metadata for both snapshots.

Mode difference preserved from the reference: **no Hubble-flow term** is
added to velocities here (``track_orbits_onthefly.py:96-110`` vs the
offline engine's ``track_orbits.py:276,284``) — an on-the-fly caller
supplies physical, simulation-internal velocities.

For the fully device-resident variant (orbit detection interleaved with a
native TPU N-body integrator, no host round trips) see
:mod:`orbitanalysis_tpu.models.nbody`.
"""

from __future__ import annotations

import time
from typing import Optional

import h5py
import jax
import numpy as np

from orbitanalysis_tpu.engine.io_hdf5 import (
    apsis_tag,
    normalize_mode_savefiles,
)
from orbitanalysis_tpu.engine.packing import pack_snapshot, required_capacity
from orbitanalysis_tpu.ops.apsis import init_carry, make_orbit_step
from orbitanalysis_tpu.utils.padding import unpack_mask


def track_orbits(
    snapshot_number,
    progenitor_links,
    regions,
    load_snapshot_data,
    savefile,
    mode: str = "pericentric",
    verbose: bool = True,
    capacity: Optional[int] = None,
    headroom: float = 1.1,
    id_dtype=np.int32,
):
    """Detect apsides between snapshots ``snapshot_number`` and
    ``snapshot_number - 1``.

    ``progenitor_links`` is a ``[2, n_halos]`` array: row 0 the halo IDs at
    ``snapshot_number``, row 1 their progenitors at the previous snapshot,
    with −1 where a halo has no (pro)genitor — exactly the reference's
    contract (``track_orbits_onthefly.py:22-31``).

    ``mode='both'`` writes the pericenter and apocenter catalogs in one
    call (``savefile`` must be a pair of path templates): both snapshots
    are loaded and packed once — the dominant cost the reference pays
    per call (``track_orbits_onthefly.py:22-34``) — and only the
    sign-flip detection runs per mode.
    """
    modes, savefiles = normalize_mode_savefiles(mode, savefile)
    progenitor_links = np.asarray(progenitor_links)
    n_halos = progenitor_links.shape[1]

    packed = []
    meta = []  # (region_positions_full, region_radii_full)
    box_size = None
    lengths_all = []
    raw = []
    for s, halo_ids in zip(
        [snapshot_number, snapshot_number - 1], progenitor_links
    ):
        rows = np.argwhere(halo_ids != -1).flatten()
        out = regions(s, halo_ids[rows])
        region_pos, region_rad = out[0], out[1]
        region_pos = np.atleast_2d(np.asarray(region_pos))
        region_rad = np.atleast_1d(np.asarray(region_rad))

        snapshot = load_snapshot_data(s, region_pos, region_rad)
        if "box_size" in snapshot:
            box_size = snapshot["box_size"]
        offsets = np.asarray(snapshot["region_offsets"], dtype=np.int64)
        lengths = np.diff(np.concatenate((offsets, [len(snapshot["ids"])])))
        lengths_all.append(int(lengths.max(initial=0)))
        raw.append((snapshot, rows, region_pos, region_rad))

        pos_full = -np.ones((n_halos, 3), dtype=np.float64)
        pos_full[rows] = region_pos
        rad_full = -np.ones(n_halos, dtype=np.float64)
        rad_full[rows] = region_rad
        meta.append((pos_full, rad_full))

    cap = capacity or required_capacity(lengths_all, headroom)
    for snapshot, rows, region_pos, _rad in raw:
        packed.append(
            pack_snapshot(snapshot, rows, n_halos, cap, region_pos,
                          id_dtype=id_dtype)
        )
    cur, prev = packed  # raw order is [s, s-1]

    cur_batch, prev_batch = _to_batch(cur), _to_batch(prev)
    events_by_mode = {}
    shared = None  # mode-independent channels, unpacked once
    for mname in modes:
        step = jax.jit(
            make_orbit_step(
                mode=mname, box_size=box_size, id_dtype=id_dtype,
                with_dtheta=True,  # on-the-fly schema stores angle changes
            )
        )

        t0 = time.time()
        carry0 = init_carry(n_halos, cap, id_dtype=id_dtype)
        carry, seed_events = step(carry0, prev_batch)
        _, events = step(carry, cur_batch)
        if verbose:
            print(
                "Identified {}s in {} s\n".format(
                    apsis_tag(mname), time.time() - t0
                )
            )
        events_by_mode[mname] = np.asarray(events.apsis)

        if shared is None:
            # entered/departed/matched sets, angle changes, and bulk
            # velocities do not depend on the sign-flip mode
            dtheta = np.asarray(events.dtheta)
            matched = np.asarray(events.matched_prev)
            departed = np.asarray(events.departed)
            entered = np.asarray(events.entered)
            _, angle_changes = unpack_mask(matched, dtheta)
            departed_offsets, departed_ids = unpack_mask(departed, prev.ids)
            entered_offsets, entered_ids = unpack_mask(entered, cur.ids)
            bulk = np.stack([
                np.asarray(events.bulk_vel),
                np.asarray(seed_events.bulk_vel),
            ])
            # reference leaves NaN bulk velocities for halos with no
            # region (mean over an empty slice,
            # track_orbits_onthefly.py:107); mark missing rows
            # explicitly here.
            for k, (_pos_full, rad_full) in enumerate(meta):
                bulk[k][rad_full < 0] = np.nan
            shared = True

    for mname, fname in zip(modes, savefiles):
        apsis_offsets, apsis_ids = unpack_mask(
            events_by_mode[mname], prev.ids
        )
        _save(
            fname, snapshot_number, mname, box_size,
            apsis_offsets, apsis_ids, angle_changes,
            entered_offsets, entered_ids, departed_offsets, departed_ids,
            progenitor_links,
            np.stack([m[1] for m in meta]),
            np.stack([m[0] for m in meta]),
            bulk, verbose,
        )


def _to_batch(p):
    from orbitanalysis_tpu.ops.apsis import SnapshotBatch

    return SnapshotBatch(
        ids=p.ids, pos=p.pos, vel=p.vel, center=p.center,
        mass=p.mass, bulk_vel=p.bulk_vel, hubble_drag=0.0,
    )


def _save(
    savefile, snapshot_number, mode, box_size,
    apsis_offsets, apsis_ids, angle_changes,
    entered_offsets, entered_ids, departed_offsets, departed_ids,
    progenitor_links, region_radii, region_positions, bulk_velocities,
    verbose,
):
    if verbose:
        print("Saving to file...")
        t0 = time.time()
    tag = apsis_tag(mode)
    with h5py.File(savefile.format("%0.3d" % snapshot_number), "w") as hf:
        hf.create_dataset(tag + "_offsets", data=apsis_offsets)
        hf.create_dataset(tag + "_IDs", data=apsis_ids)
        hf.create_dataset("angles", data=angle_changes)
        hf.create_dataset("entered_offsets", data=entered_offsets)
        hf.create_dataset("entered_IDs", data=entered_ids)
        hf.create_dataset("departed_offsets", data=departed_offsets)
        hf.create_dataset("departed_IDs", data=departed_ids)
        hf.create_dataset("progenitor_links", data=progenitor_links)
        hf.create_dataset("region_radii", data=region_radii)
        hf.create_dataset("region_positions", data=region_positions)
        hf.create_dataset("bulk_velocities", data=bulk_velocities)
        if box_size is not None:
            hf.attrs["box_size"] = box_size
    if verbose:
        print("Saved to file in {} s\n".format(time.time() - t0))
