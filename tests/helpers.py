"""Shared test utilities: wrap synthetic per-halo snapshot dicts in the
reference's two-callback data contract."""

from __future__ import annotations

import numpy as np


def make_callbacks(snaps, centers, box_size=None, snapshot_offset=0,
                   cosmology=None, radii_value=50.0, mass=True):
    """Build (regions, load_snapshot_data) over a list of per-halo dicts.

    ``snaps``: list over snapshots of {halo_row: dict(ids, pos, vel, mass,
    center)}.  Halo IDs are taken to equal their row index.
    """

    def regions(snapshot_number, halo_ids):
        s = snaps[snapshot_number - snapshot_offset]
        pos = np.stack([s[h]["center"] for h in halo_ids])
        rad = np.full(len(halo_ids), radii_value)
        return pos, rad

    def load_snapshot_data(snapshot_number, region_positions, region_radii):
        s = snaps[snapshot_number - snapshot_offset]
        # honor the request: return blocks for exactly the requested
        # regions, in order (identified by their center positions)
        region_positions = np.atleast_2d(region_positions)
        keys = []
        for rp in region_positions:
            matches = [
                h for h in s
                if np.allclose(s[h]["center"], rp, atol=1e-9)
            ]
            assert len(matches) == 1, "ambiguous region request"
            keys.append(matches[0])
        ids = np.concatenate([s[h]["ids"] for h in keys])
        coords = np.concatenate([s[h]["pos"] for h in keys])
        vels = np.concatenate([s[h]["vel"] for h in keys])
        lens = [len(s[h]["ids"]) for h in keys]
        offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
        out = dict(
            ids=ids,
            coordinates=coords,
            velocities=vels,
            region_offsets=offsets,
        )
        if mass and "mass" in s[keys[0]]:
            out["masses"] = np.concatenate([s[h]["mass"] for h in keys])
        else:
            out["masses"] = 1.0
        if box_size is not None:
            out["box_size"] = box_size
        if cosmology is not None:
            out.update(cosmology)
        return out

    return regions, load_snapshot_data


def oracle_events_to_catalog(all_events, halo_keys):
    """Flatten OracleTracker per-snapshot events into (ids, offsets, angles)
    per snapshot for comparison with savefile contents."""
    catalogs = []
    for ev in all_events:
        ids, angles, lens = [], [], []
        for h in halo_keys:
            if h in ev and ev[h][2]:
                ids.append(ev[h][0])
                angles.append(ev[h][1])
                lens.append(len(ev[h][0]))
        if ids:
            catalogs.append(
                (
                    np.concatenate(ids),
                    np.concatenate(([0], np.cumsum(lens))),
                    np.concatenate(angles),
                )
            )
        else:
            catalogs.append(None)
    return catalogs
