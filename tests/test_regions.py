"""Region extraction vs the brute-force selection of the reference
example (``example_script.py:50-58``)."""

import numpy as np
import pytest

from orbitanalysis_tpu.engine.regions import (
    RegionExtractor,
    make_region_callbacks,
)


def _brute_force(pos, centers, radii, box):
    blocks = []
    for c, r in zip(centers, radii):
        d = pos - c
        if box is not None:
            d -= box * np.round(d / box)
        blocks.append(np.where((d * d).sum(1) < r * r)[0])
    return blocks


@pytest.mark.parametrize("box", [None, 100.0])
def test_extractor_matches_brute_force(rng, box):
    n = 20000
    span = 100.0
    pos = rng.uniform(0, span, size=(n, 3))
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)

    ex = RegionExtractor(ids, pos, vel, masses=mass, box_size=box)
    centers = rng.uniform(5, span - 5, size=(5, 3))
    # include a region straddling the periodic boundary
    if box is not None:
        centers[0] = [1.0, 1.0, 1.0]
    radii = rng.uniform(3.0, 12.0, 5)

    out = ex.extract(centers, radii)
    expect = _brute_force(pos, centers, radii, box)
    offs = np.concatenate((out["region_offsets"], [len(out["ids"])]))
    for k in range(5):
        got_ids = np.sort(out["ids"][offs[k]:offs[k + 1]])
        exp_ids = np.sort(ids[expect[k]])
        assert np.array_equal(got_ids, exp_ids), k
    # masses selected consistently
    assert len(out["masses"]) == len(out["ids"])
    if box is not None:
        assert out["box_size"] == box


def test_region_callbacks_drive_tracker(tmp_path, rng):
    """make_region_callbacks + track_orbits end-to-end on a snapshot set
    with a moving clump."""
    import h5py

    from orbitanalysis_tpu import track_orbits

    box = 60.0
    n = 3000
    n_snap = 5
    base = rng.uniform(0, box, size=(n, 3))
    ids = np.arange(n)
    snapshots, catalog = {}, {}
    for s in range(n_snap):
        drift = 0.5 * s
        pos = np.mod(base + drift, box)
        snapshots[s] = dict(
            ids=ids,
            coordinates=pos,
            velocities=rng.normal(size=(n, 3)),
            masses=1.0,
        )
        catalog[s] = (
            np.array([0, 1]),
            np.mod(np.array([[10.0 + drift] * 3, [40.0 + drift] * 3]), box),
            np.array([8.0, 8.0]),
        )
    regions, loader = make_region_callbacks(snapshots, catalog, box_size=box)
    save = str(tmp_path / "regions.h5")
    track_orbits(np.arange(n_snap), np.tile([0, 1], (n_snap, 1)),
                 regions, loader, save, verbose=False)
    with h5py.File(save) as hf:
        assert len([k for k in hf if k.startswith("snapshot_")]) == n_snap - 1


def test_extractor_periodic_with_non_dividing_cell_size(rng):
    """A cell_size that does not divide the box must still find particles
    across the periodic boundary (regression: index-mod vs position-mod
    mismatch dropped them)."""
    box = 100.0
    pos = np.array([[1.0, 50.0, 50.0], [99.0, 50.0, 50.0],
                    [50.0, 50.0, 50.0]])
    ids = np.array([10, 20, 30])
    vel = np.zeros((3, 3), np.float32)
    ex = RegionExtractor(ids, pos, vel, box_size=box, cell_size=7.0)
    out = ex.extract(np.array([[99.5, 50.0, 50.0]]), np.array([3.0]))
    # both boundary particles are within periodic distance 3 of x=99.5
    assert set(out["ids"].tolist()) == {10, 20}
