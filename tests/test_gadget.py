"""Gadget-style HDF5 adapter: write synthetic snapshot/catalog files,
track through the file-backed callbacks, compare against the in-memory
path (the reference example's exact workflow, made runnable)."""

import h5py
import numpy as np
import pytest

from orbitanalysis_tpu import track_orbits
from orbitanalysis_tpu.engine.gadget import make_gadget_callbacks
from orbitanalysis_tpu.models.synthetic import churn_snapshots

from helpers import make_callbacks


@pytest.fixture
def gadget_files(tmp_path):
    box = 60.0
    n_halos, n_part, n_snap = 2, 120, 5
    snaps, centers = churn_snapshots(
        n_halos, n_part, n_snap, box_size=box, seed=53
    )
    # pin the halos far apart and use a region radius (catalog writes
    # R = 20/4 below) small enough that each region contains exactly its
    # own halo's members — the premise for file-path == memory-path
    centers[:] = np.array([[15.0, 15.0, 15.0], [45.0, 45.0, 45.0]])
    for s in range(n_snap):
        for h in range(n_halos):
            rel = snaps[s][h]["pos"] - snaps[s][h]["center"]
            rel -= box * np.round(rel / box)
            snaps[s][h]["pos"] = np.mod(centers[h] + rel, box)
            snaps[s][h]["center"] = centers[h].copy()
    snap_fmt = str(tmp_path / "snapshot_{:03d}.hdf5")
    cat_fmt = str(tmp_path / "halo_catalogue_{:03d}.hdf5")
    for s in range(n_snap):
        keys = sorted(snaps[s].keys())
        ids = np.concatenate([snaps[s][h]["ids"] for h in keys])
        pos = np.concatenate([snaps[s][h]["pos"] for h in keys])
        vel = np.concatenate([snaps[s][h]["vel"] for h in keys])
        mass = np.concatenate([snaps[s][h]["mass"] for h in keys])
        # shuffle: file order must not matter
        perm = np.random.default_rng(s).permutation(len(ids))
        with h5py.File(snap_fmt.format(s), "w") as hf:
            hf.attrs["BoxSize"] = box
            hf.attrs["Redshift"] = 0.0
            g = hf.create_group("PartType1")
            g.create_dataset("ParticleIDs", data=ids[perm])
            g.create_dataset("Coordinates", data=pos[perm])
            g.create_dataset("Velocities", data=vel[perm])
            g.create_dataset("Masses", data=mass[perm])
        with h5py.File(cat_fmt.format(s), "w") as hf:
            hf.create_dataset(
                "position_of_minimum_potential",
                data=np.stack([snaps[s][h]["center"] for h in keys]),
            )
            hf.create_dataset(
                "R_200crit", data=np.full(n_halos, 20.0 / 4.0)
            )
    return snap_fmt, cat_fmt, snaps, centers, box, n_snap, n_halos


def test_gadget_callbacks_match_in_memory(tmp_path, gadget_files):
    snap_fmt, cat_fmt, snaps, centers, box, n_snap, n_halos = gadget_files
    regions_f, loader_f = make_gadget_callbacks(
        snap_fmt, cat_fmt, group="PartType1"
    )
    regions_m, loader_m = make_callbacks(snaps, centers, box_size=box,
                                         radii_value=20.0)

    snap_nums = np.arange(n_snap)
    branches = np.tile(np.arange(n_halos), (n_snap, 1))
    f_save = str(tmp_path / "file.h5")
    m_save = str(tmp_path / "mem.h5")
    track_orbits(snap_nums, branches, regions_f, loader_f, f_save,
                 verbose=False)
    track_orbits(snap_nums, branches, regions_m, loader_m, m_save,
                 verbose=False)

    with h5py.File(f_save) as a, h5py.File(m_save) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            offs_a = a[k]["region_offsets"][:]
            offs_b = b[k]["region_offsets"][:]
            assert np.array_equal(offs_a, offs_b), k
            # file order differs (shuffled on write), so compare apsis
            # ID sets per halo
            for h in range(len(offs_a) - 1):
                ia = np.sort(a[k]["pericenter_IDs"][offs_a[h]:offs_a[h+1]])
                ib = np.sort(b[k]["pericenter_IDs"][offs_b[h]:offs_b[h+1]])
                assert np.array_equal(ia, ib), (k, h)


def test_gadget_flat_layout_and_scalar_mass(tmp_path):
    """The example's flat (ungrouped) layout with no Masses dataset."""
    box = 50.0
    n = 200
    rng = np.random.default_rng(7)
    snap_fmt = str(tmp_path / "flat_{:03d}.hdf5")
    cat_fmt = str(tmp_path / "cat_{:03d}.hdf5")
    for s in range(3):
        with h5py.File(snap_fmt.format(s), "w") as hf:
            hf.attrs["BoxSize"] = box
            hf.create_dataset("ParticleIDs", data=np.arange(n))
            hf.create_dataset(
                "Coordinates",
                data=np.mod(
                    25.0 + rng.normal(scale=2.0, size=(n, 3)) + 0.1 * s, box
                ),
            )
            hf.create_dataset(
                "Velocities", data=rng.normal(size=(n, 3))
            )
        with h5py.File(cat_fmt.format(s), "w") as hf:
            hf.create_dataset(
                "position_of_minimum_potential", data=np.full((1, 3), 25.0)
            )
            hf.create_dataset("R_200crit", data=np.array([5.0]))
    regions, loader = make_gadget_callbacks(snap_fmt, cat_fmt)
    out = loader(0, *regions(0, np.array([0])))
    assert out["masses"] == 1.0
    assert out["box_size"] == box
    assert len(out["ids"]) > 0
    save = str(tmp_path / "o.h5")
    track_orbits(np.arange(3), np.zeros((3, 1), np.int64), regions, loader,
                 save, verbose=False)
    with h5py.File(save) as hf:
        assert len([k for k in hf if k.startswith("snapshot_")]) == 2
