"""Postprocessing tier: collation, final-count retro-mapping, the
decomposition/plot API, and progenitor linking."""

import h5py
import numpy as np
import pytest

from orbitanalysis_tpu import (
    Apsides,
    OrbitDecomposition,
    find_main_progenitors,
    get_central_particle_ids,
    track_orbits,
)
from orbitanalysis_tpu.models.synthetic import churn_snapshots

from helpers import make_callbacks
from oracle import OracleTracker


@pytest.fixture(scope="module")
def tracked(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("post")
    box = 60.0
    n_halos, n_part, n_snap = 3, 150, 8
    snaps, centers = churn_snapshots(
        n_halos, n_part, n_snap, box_size=box, seed=17
    )
    regions, loader = make_callbacks(snaps, centers, box_size=box)
    snap_nums = np.arange(n_snap)
    branches = np.tile(np.arange(n_halos), (n_snap, 1))
    save = str(tmp / "orbits.h5")
    track_orbits(snap_nums, branches, regions, loader, save, verbose=False)
    return save, snaps, box, n_snap, regions, loader, str(tmp)


def _oracle_collated_counts(snaps, box, upto, angle_cut, halo):
    """Accumulate (id, count) for one halo through snapshot `upto` the
    oracle way: count apsides with angle > angle_cut."""
    oracle = OracleTracker(mode="pericentric", box_size=box)
    acc = []
    for s in range(upto + 1):
        ev = oracle.step(snaps[s])
        if s > 0:
            ids, angles, _ = ev[halo]
            acc.extend(ids[np.asarray(angles) > angle_cut].tolist())
    return np.unique(np.asarray(acc), return_counts=True)


def test_collation_counts_match_oracle(tracked):
    save, snaps, box, n_snap, _, _, tmp = tracked
    coll = tmp + "/collated.h5"
    angle_cut = 0.1
    Apsides(save).collate_apsides(
        savefile=coll, angle_cut=angle_cut, verbose=False
    )
    with h5py.File(coll) as hf:
        keys = sorted(k for k in hf if k.startswith("snapshot_"))
        assert len(keys) == n_snap - 1
        g = hf[keys[-1]]
        offsets = np.concatenate(
            (g["halo_offsets"][:], [len(g["particle_IDs"])])
        )
        for h in range(3):
            got_ids = g["particle_IDs"][offsets[h]:offsets[h + 1]]
            got_counts = g["pericenter_counts"][offsets[h]:offsets[h + 1]]
            # f16 angle storage vs the oracle's f32 comparison can flip
            # events whose angle sits within an ulp of the cut; exclude
            # those from the strict comparison
            exp_ids, exp_counts = _oracle_collated_counts(
                snaps, box, n_snap - 1, angle_cut, h
            )
            assert np.array_equal(got_ids, exp_ids), h
            assert np.array_equal(got_counts, exp_counts), h


def test_device_collation_matches_host(tracked):
    """collate_apsides(device=True) must write a byte-identical catalog
    (same groups, datasets, dtypes, values) as the host path."""
    save, snaps, box, n_snap, _, _, tmp = tracked
    host_f = tmp + "/coll_host.h5"
    dev_f = tmp + "/coll_dev.h5"
    for f, dev in ((host_f, False), (dev_f, True)):
        Apsides(save).collate_apsides(
            savefile=f, angle_cut=0.1, save_final_counts=True,
            verbose=False, device=dev,
        )
    with h5py.File(host_f) as a, h5py.File(dev_f) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            assert sorted(a[k].keys()) == sorted(b[k].keys()), k
            for ds in a[k]:
                assert a[k][ds].dtype == b[k][ds].dtype, (k, ds)
                assert np.array_equal(a[k][ds][:], b[k][ds][:]), (k, ds)


def test_device_collation_subset_and_midpoint(tracked):
    """Device collation with a halo subset and a mid-sequence stop."""
    save, snaps, box, n_snap, _, _, tmp = tracked
    host_f = tmp + "/coll_host_sub.h5"
    dev_f = tmp + "/coll_dev_sub.h5"
    for f, dev in ((host_f, False), (dev_f, True)):
        Apsides(save).collate_apsides(
            halo_ids=np.array([2, 0]), snapshot_number=n_snap - 3,
            savefile=f, verbose=False, device=dev,
        )
    with h5py.File(host_f) as a, h5py.File(dev_f) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            for ds in a[k]:
                assert np.array_equal(a[k][ds][:], b[k][ds][:]), (k, ds)


def test_final_counts_retro_mapping(tracked):
    save, snaps, box, n_snap, _, _, tmp = tracked
    coll = tmp + "/collated_final.h5"
    Apsides(save).collate_apsides(
        savefile=coll, save_final_counts=True, verbose=False
    )
    with h5py.File(coll) as hf:
        keys = sorted(k for k in hf if k.startswith("snapshot_"))
        gfin = hf[keys[-1]]
        fin_ids = gfin["particle_IDs"][:]
        fin_counts = gfin["pericenter_counts"][:]
        lookup = dict(zip(fin_ids.tolist(), fin_counts.tolist()))
        for k in keys[:-1]:
            g = hf[k]
            assert "pericenter_counts_final" in g
            ids = g["particle_IDs"][:]
            retro = g["pericenter_counts_final"][:]
            assert np.issubdtype(retro.dtype, np.integer)
            for pid, c in zip(ids.tolist(), retro.tolist()):
                assert lookup.get(pid, 0) == c or pid not in lookup


def test_decomposition_and_plots(tracked):
    save, snaps, box, n_snap, regions, loader, tmp = tracked
    od = OrbitDecomposition(save)
    sd = loader(n_snap - 1, *regions(n_snap - 1, np.array([1])))
    od.get_halo_decomposition_at_snapshot(
        1, snapshot_number=n_snap - 1, snapshot_data=sd
    )
    assert od.counts is not None and len(od.counts) == len(sd["ids"])
    assert od.radii is not None
    assert np.all(od.radii >= 0)
    f1 = tmp + "/pos.png"
    f2 = tmp + "/phase.png"
    od.plot_position_space(savefile=f1)
    od.plot_phase_space(savefile=f2, logr=False)
    import os
    assert os.path.getsize(f1) > 1000
    assert os.path.getsize(f2) > 1000


def test_collate_rejects_unknown_halo(tracked):
    save = tracked[0]
    ap = Apsides(save)
    with pytest.raises(ValueError):
        ap.collate_apsides(halo_ids=np.array([999]), savefile="/tmp/x.h5")


def test_progenitor_linking_pipeline(rng):
    """Central-particle selection + majority vote across two catalogs."""
    n_halos, n_per = 4, 300
    centers = rng.uniform(0, 100, size=(n_halos, 3))
    # catalog at snapshot s: halos with particles clustered around centers
    ids, coords, lens = [], [], []
    for h in range(n_halos):
        ids.append(np.arange(h * 1000, h * 1000 + n_per))
        r = rng.normal(scale=2.0 * (1 + 0.2 * h), size=(n_per, 3))
        coords.append(centers[h] + r)
        lens.append(n_per)
    snapshot = dict(
        ids=np.concatenate(ids),
        coordinates=np.concatenate(coords),
        region_offsets=np.concatenate(([0], np.cumsum(lens)))[:-1],
    )
    central_ids, offsets = get_central_particle_ids(
        snapshot, centers, n=50
    )
    assert len(central_ids) == n_halos * 50
    # each block must come from its own halo and be radius-sorted
    for h in range(n_halos):
        blk = central_ids[offsets[h]:offsets[h] + 50]
        assert np.all((blk >= h * 1000) & (blk < h * 1000 + n_per))
        r = np.linalg.norm(
            snapshot["coordinates"][
                np.searchsorted(ids[h], blk) + h * n_per
            ] - centers[h],
            axis=1,
        )
        assert np.all(np.diff(r) >= -1e-9)

    # earlier catalog: halo order permuted, same membership
    perm = np.array([2, 0, 3, 1])
    halo_pids = np.concatenate([ids[p] for p in perm])
    halo_offsets = np.arange(n_halos) * n_per
    tracked_offsets = offsets
    prog = find_main_progenitors(
        halo_pids, halo_offsets, central_ids, tracked_offsets
    )
    expect = [int(np.where(perm == h)[0][0]) for h in range(n_halos)]
    assert prog == expect


def test_progenitor_vote_device_matches_host(rng):
    """The device sorted-join + bit-packed segment-max vote equals the
    host implementation on randomized catalogs — including duplicate
    tracked IDs (vote once), ties (smaller halo wins), descendants with
    no matches (-1), and empty tracked blocks."""
    from orbitanalysis_tpu.progenitors import (
        find_main_progenitors,
        find_main_progenitors_device,
    )

    for trial in range(6):
        n_halos = int(rng.integers(2, 9))
        n_desc = int(rng.integers(1, 7))
        halo_lens = rng.integers(0, 40, size=n_halos)
        pool = rng.permutation(5000)[: halo_lens.sum()]
        halo_pids = pool.astype(np.int32)
        halo_offsets = np.concatenate(
            ([0], np.cumsum(halo_lens))
        )[:-1]
        tracked_lens = rng.integers(0, 25, size=n_desc)
        t = []
        for L in tracked_lens:
            # mix of real members, misses, and duplicates
            members = rng.choice(pool, size=max(L // 2, 1))
            misses = rng.integers(6000, 7000, size=L - len(members))
            t.append(np.concatenate([members, misses])[:L])
        tracked = (np.concatenate(t) if t else np.zeros(0)).astype(
            np.int32
        )
        # inject exact duplicates across descendants
        if len(tracked) > 4:
            tracked[-1] = tracked[0]
        tracked_offsets = np.concatenate(
            ([0], np.cumsum(tracked_lens))
        )[:-1]
        want = find_main_progenitors(
            halo_pids, halo_offsets, tracked, tracked_offsets
        )
        got = find_main_progenitors_device(
            halo_pids, halo_offsets, tracked, tracked_offsets
        )
        assert got == want, (trial, got, want)


def test_progenitor_vote_device_fallbacks(rng):
    """64-bit IDs take the host path and still return correct links."""
    from orbitanalysis_tpu.progenitors import find_main_progenitors_device

    halo_pids = (np.arange(100) + (1 << 40)).astype(np.int64)
    halo_offsets = np.array([0, 50])
    tracked = halo_pids[60:70]
    tracked_offsets = np.array([0, 5])
    prog = find_main_progenitors_device(
        halo_pids, halo_offsets, tracked, tracked_offsets
    )
    assert prog == [1, 1]


def test_progenitor_no_match_returns_minus1(rng):
    halo_pids = np.arange(100)
    halo_offsets = np.array([0, 50])
    tracked = np.arange(1000, 1020)
    tracked_offsets = np.array([0, 10])
    prog = find_main_progenitors(
        halo_pids, halo_offsets, tracked, tracked_offsets
    )
    assert prog == [-1, -1]


def test_central_ids_device_matches_host(rng):
    """lax.top_k device path == NumPy host path (set-wise per halo; ties
    at equal radius may order differently)."""
    from orbitanalysis_tpu.progenitors import (
        get_central_particle_ids,
        get_central_particle_ids_device,
    )

    n_halos, n_per = 3, 400
    centers = rng.uniform(0, 100, size=(n_halos, 3))
    ids, coords, lens = [], [], []
    for h in range(n_halos):
        m = n_per - 30 * h
        ids.append(np.arange(h * 10000, h * 10000 + m))
        coords.append(centers[h] + rng.normal(scale=3.0, size=(m, 3)))
        lens.append(m)
    snapshot = dict(
        ids=np.concatenate(ids),
        coordinates=np.concatenate(coords),
        region_offsets=np.concatenate(([0], np.cumsum(lens)))[:-1],
        box_size=200.0,
    )
    a_ids, a_off = get_central_particle_ids(snapshot, centers, n=64)
    b_ids, b_off = get_central_particle_ids_device(snapshot, centers, n=64)
    assert np.array_equal(a_off, b_off)
    offs = np.concatenate((a_off, [len(a_ids)]))
    for h in range(n_halos):
        assert np.array_equal(
            np.sort(a_ids[offs[h]:offs[h + 1]]),
            np.sort(b_ids[offs[h]:offs[h + 1]]),
        ), h
        # both radius-ordered: first entries identical
        assert a_ids[offs[h]] == b_ids[offs[h]]


def test_mid_sequence_final_counts(tmp_path):
    """save_final_counts with a mid-sequence collation target must map
    through the z=0 descendant space (per-snapshot halo IDs differ from
    z=0 IDs in real catalogs)."""
    import h5py

    from orbitanalysis_tpu.models.synthetic import churn_snapshots

    box = 60.0
    n_halos, n_snap = 3, 6
    snaps, centers = churn_snapshots(n_halos, 120, n_snap, box_size=box,
                                     seed=77)
    # per-snapshot halo IDs: distinct at every snapshot (progenitors)
    branches = np.stack([
        np.arange(n_halos) + 1000 * s for s in range(n_snap)
    ])

    def regions(snapshot_number, halo_ids):
        rows = np.asarray(halo_ids) % 1000
        s = snaps[int(snapshot_number)]
        return (np.stack([s[h]["center"] for h in rows]),
                np.full(len(rows), 50.0))

    def loader(snapshot_number, region_positions, region_radii):
        s = snaps[int(snapshot_number)]
        keys = []
        for rp in np.atleast_2d(region_positions):
            keys += [h for h in s
                     if np.allclose(s[h]["center"], rp, atol=1e-9)]
        lens = [len(s[h]["ids"]) for h in keys]
        return dict(
            ids=np.concatenate([s[h]["ids"] for h in keys]),
            coordinates=np.concatenate([s[h]["pos"] for h in keys]),
            velocities=np.concatenate([s[h]["vel"] for h in keys]),
            region_offsets=np.concatenate(([0], np.cumsum(lens)))[:-1],
            box_size=box,
        )

    save = str(tmp_path / "mid.h5")
    track_orbits(np.arange(n_snap), branches, regions, loader, save,
                 verbose=False)
    coll = str(tmp_path / "coll.h5")
    # collate only up to snapshot 4 (mid-sequence): the last collated
    # group's halo_IDs are progenitor IDs, not z=0 IDs
    Apsides(save).collate_apsides(
        snapshot_number=4, savefile=coll, save_final_counts=True,
        verbose=False,
    )
    with h5py.File(coll) as hf:
        keys = sorted(hf.keys())
        assert keys[-1] == "snapshot_004"
        for k in keys[:-1]:
            assert "pericenter_counts_final" in hf[k], k
            assert np.issubdtype(
                hf[k]["pericenter_counts_final"].dtype, np.integer
            )
