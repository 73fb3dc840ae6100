"""track_orbits over a 'shards' mesh (hash-sharded particle engine):
savefiles must match the general single-device run event-for-event,
including crash-resume."""

import h5py
import jax
import numpy as np
import pytest

from orbitanalysis_tpu import track_orbits
from orbitanalysis_tpu.models.synthetic import churn_snapshots
from orbitanalysis_tpu.parallel import make_mesh

from helpers import make_callbacks

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture
def setup():
    box = 60.0
    n_halos, n_part, n_snap = 3, 150, 8
    snaps, centers = churn_snapshots(
        n_halos, n_part, n_snap, box_size=box, seed=23
    )
    regions, loader = make_callbacks(snaps, centers, box_size=box)
    snap_nums = np.arange(n_snap)
    branches = np.tile(np.arange(n_halos), (n_snap, 1))
    return box, regions, loader, snap_nums, branches


def _compare_savefiles(a_path, b_path):
    with h5py.File(a_path) as a, h5py.File(b_path) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            assert sorted(a[k].keys()) == sorted(b[k].keys()), k
            for ds in a[k]:
                va, vb = a[k][ds][:], b[k][ds][:]
                if ds in ("bulk_velocities",):
                    # different reduction order (segment psum vs masked
                    # row mean) -> float ulps
                    assert np.allclose(va, vb, atol=1e-4), (k, ds)
                elif ds == "angles":
                    assert np.allclose(
                        va.astype(np.float32), vb.astype(np.float32),
                        atol=2e-3,
                    ), (k, ds)
                else:
                    assert np.array_equal(va, vb), (k, ds)


def test_tracker_hash_matches_general(tmp_path, setup):
    box, regions, loader, snap_nums, branches = setup
    mesh = make_mesh({"shards": 8})
    save_h = str(tmp_path / "hash.h5")
    track_orbits(snap_nums, branches, regions, loader, save_h,
                 mesh=mesh, verbose=False)
    save_g = str(tmp_path / "general.h5")
    track_orbits(snap_nums, branches, regions, loader, save_g,
                 join_impl="general", verbose=False)
    _compare_savefiles(save_h, save_g)


def test_tracker_hash_crash_resume(tmp_path, setup):
    box, regions, loader, snap_nums, branches = setup
    mesh = make_mesh({"shards": 8})
    straight = str(tmp_path / "straight.h5")
    track_orbits(snap_nums, branches, regions, loader, straight,
                 mesh=mesh, checkpoint=True, verbose=False)

    state = {"crashed": False}

    def loader_crash(s, rp, rr):
        if s == 5 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("simulated crash")
        return loader(s, rp, rr)

    resumed = str(tmp_path / "resumed.h5")
    with pytest.raises(RuntimeError):
        track_orbits(snap_nums, branches, regions, loader_crash, resumed,
                     mesh=mesh, checkpoint=True, verbose=False)
    track_orbits(snap_nums, branches, regions, loader_crash, resumed,
                 mesh=mesh, checkpoint=True, resume=True, verbose=False)
    with h5py.File(straight) as a, h5py.File(resumed) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            for ds in a[k]:
                assert np.array_equal(a[k][ds][:], b[k][ds][:]), (k, ds)


def test_hash_engine_empty_checkpoint_resume():
    """Resuming from a checkpoint whose angle sidecar is empty (zero
    tracked particles at the crash snapshot) must not index into the
    empty array; carry angles stay zero."""
    from orbitanalysis_tpu.engine.tracker import _HashEngine

    mesh = make_mesh({"shards": 4}, jax.devices()[:4])
    eng = _HashEngine(mesh, n_halos=2, mode="pericentric",
                      box_size=60.0, cap=64, angle_dtype=np.float32)
    before = np.asarray(eng.carry.angles)
    eng.set_angles_flat(np.zeros(0, dtype=np.float32))
    assert np.array_equal(np.asarray(eng.carry.angles), before)


def test_tracker_hash_halo_born_and_masses(tmp_path, setup):
    box, regions, loader, snap_nums, branches = setup
    branches = branches.copy()
    branches[:4, 1] = -1  # halo 1 born at snapshot 4
    mesh = make_mesh({"shards": 4}, jax.devices()[:4])
    save_h = str(tmp_path / "hash_born.h5")
    track_orbits(snap_nums, branches, regions, loader, save_h,
                 mesh=mesh, verbose=False)
    save_g = str(tmp_path / "general_born.h5")
    track_orbits(snap_nums, branches, regions, loader, save_g,
                 join_impl="general", verbose=False)
    _compare_savefiles(save_h, save_g)


def test_tracker_hash_both_mode(tmp_path, setup):
    """mode='both' over a 'shards' mesh: one routed batch feeds both
    detectors; each savefile equals the corresponding single-mode
    hash-sharded run's."""
    box, regions, loader, snap_nums, branches = setup
    mesh = make_mesh({"shards": 4}, jax.devices()[:4])
    peri1 = str(tmp_path / "peri_single.h5")
    apo1 = str(tmp_path / "apo_single.h5")
    track_orbits(snap_nums, branches, regions, loader, peri1,
                 mode="pericentric", mesh=mesh, verbose=False)
    track_orbits(snap_nums, branches, regions, loader, apo1,
                 mode="apocentric", mesh=mesh, verbose=False)
    peri2 = str(tmp_path / "peri_both.h5")
    apo2 = str(tmp_path / "apo_both.h5")
    track_orbits(snap_nums, branches, regions, loader, (peri2, apo2),
                 mode="both", mesh=mesh, verbose=False)
    _compare_savefiles(peri1, peri2)
    _compare_savefiles(apo1, apo2)


def test_tracker_hash_wide_ids(tmp_path, setup):
    """Gadget-style uint64 IDs (>= 2^31) through the hash engine
    (round-2 review item 5): the device rides dense int32 handles via
    WideIdMap, routing stays stable across snapshots, and the savefile
    carries the REAL wide IDs.  Must equal the int32 run with every ID
    shifted by 2^33."""
    box, regions, loader, snap_nums, branches = setup
    SHIFT = np.int64(2) ** 33

    def loader_wide(s, rp, rr):
        d = dict(loader(s, rp, rr))
        d["ids"] = d["ids"].astype(np.int64) + SHIFT
        return d

    mesh = make_mesh({"shards": 8})
    save_w = str(tmp_path / "wide.h5")
    track_orbits(snap_nums, branches, regions, loader_wide, save_w,
                 mesh=mesh, id_dtype=np.int64, verbose=False)
    save_n = str(tmp_path / "narrow.h5")
    track_orbits(snap_nums, branches, regions, loader, save_n,
                 mesh=mesh, verbose=False)

    with h5py.File(save_w) as a, h5py.File(save_n) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        total_ids = 0
        for k in a:
            assert sorted(a[k].keys()) == sorted(b[k].keys()), k
            for ds in a[k]:
                va, vb = a[k][ds][:], b[k][ds][:]
                if ds.endswith("center_IDs"):
                    assert va.dtype == np.int64, (k, ds)
                    assert np.array_equal(
                        va, vb.astype(np.int64) + SHIFT), (k, ds)
                    assert va.size == 0 or va.min() >= SHIFT
                    total_ids += va.size
                elif ds == "bulk_velocities":
                    assert np.allclose(va, vb, atol=1e-4), (k, ds)
                elif ds == "angles":
                    assert np.allclose(
                        va.astype(np.float32), vb.astype(np.float32),
                        atol=2e-3,
                    ), (k, ds)
                else:
                    assert np.array_equal(va, vb), (k, ds)
        assert total_ids > 0  # events actually flowed


def test_tracker_hash_wide_ids_crash_resume(tmp_path, setup):
    """Wide-ID hash runs must survive crash-resume: the handle map is
    rebuilt from the resume snapshot (handles never cross runs — the
    savefile and checkpoint carry only real IDs / load-order state)."""
    box, regions, loader, snap_nums, branches = setup
    SHIFT = np.int64(2) ** 33

    def loader_wide(s, rp, rr):
        d = dict(loader(s, rp, rr))
        d["ids"] = d["ids"].astype(np.int64) + SHIFT
        return d

    mesh = make_mesh({"shards": 8})
    straight = str(tmp_path / "straight.h5")
    track_orbits(snap_nums, branches, regions, loader_wide, straight,
                 mesh=mesh, id_dtype=np.int64, checkpoint=True,
                 verbose=False)

    state = {"crashed": False}

    def loader_crash(s, rp, rr):
        if s == 5 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("simulated crash")
        return loader_wide(s, rp, rr)

    resumed = str(tmp_path / "resumed.h5")
    with pytest.raises(RuntimeError):
        track_orbits(snap_nums, branches, regions, loader_crash, resumed,
                     mesh=mesh, id_dtype=np.int64, checkpoint=True,
                     verbose=False)
    track_orbits(snap_nums, branches, regions, loader_crash, resumed,
                 mesh=mesh, id_dtype=np.int64, checkpoint=True,
                 resume=True, verbose=False)
    _compare_savefiles(straight, resumed)
