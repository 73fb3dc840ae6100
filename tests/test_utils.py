"""Unit tier (SURVEY.md §4): padding, periodic wrap, Hubble parameter."""

import numpy as np
import pytest

from orbitanalysis_tpu.utils import (
    INVALID_ID,
    hubble_parameter,
    pack_ragged,
    periodic_displacement,
    round_up,
    unpack_mask,
    vector_norm,
)

pytestmark = pytest.mark.smoke  # <60 s core tier


def test_round_up():
    assert round_up(1) == 128
    assert round_up(128) == 128
    assert round_up(129) == 256
    assert round_up(0) == 128


def test_pack_unpack_roundtrip(rng):
    lens = np.array([5, 0, 3, 7])
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    vals = rng.integers(0, 1000, int(lens.sum()))
    packed = pack_ragged(vals, offsets, 4, 16, fill=INVALID_ID)
    assert packed.shape == (4, 16)
    # each block in slot order
    assert np.array_equal(packed[0, :5], vals[:5])
    assert np.array_equal(packed[2, :3], vals[5:8])
    assert np.array_equal(packed[3, :7], vals[8:])
    assert np.all(packed[1] == INVALID_ID)

    mask = packed != INVALID_ID
    out_offsets, out_vals = unpack_mask(mask, packed)
    assert np.array_equal(out_vals, vals)
    assert np.array_equal(np.diff(out_offsets), lens)


def test_pack_rows_and_vector_payload(rng):
    vals = rng.normal(size=(6, 3))
    offsets = np.array([0, 2])
    packed = pack_ragged(vals, offsets, 5, 8, rows=np.array([1, 3]))
    assert packed.shape == (5, 8, 3)
    assert np.allclose(packed[1, :2], vals[:2])
    assert np.allclose(packed[3, :4], vals[2:])
    assert np.all(packed[0] == 0)


def test_unpack_mask_row_subset(rng):
    data = rng.normal(size=(4, 8))
    mask = rng.random((4, 8)) < 0.5
    offs, vals = unpack_mask(mask, data, rows=np.array([0, 2]))
    expected = np.concatenate([data[0][mask[0]], data[2][mask[2]]])
    assert np.allclose(vals, expected)
    assert offs[-1] == mask[0].sum() + mask[2].sum()


def test_capacity_overflow_raises(rng):
    with pytest.raises(ValueError, match="exceeds capacity"):
        pack_ragged(np.arange(10), np.array([0]), 1, 8)


def test_periodic_wrap_matches_reference_semantics(rng):
    box = 100.0
    x = rng.uniform(-49.9, 49.9, size=(1000, 3))
    shift = box * rng.integers(-3, 4, size=(1000, 3))
    # float32 on device: tolerance scaled to the pre-wrap magnitude (~350)
    wrapped = np.asarray(periodic_displacement(x + shift, box))
    assert np.allclose(wrapped, x, atol=1e-4)
    # float64 stays float64 when running NumPy inputs through the helper
    wrapped64 = np.asarray(periodic_displacement((x + shift).astype(np.float64), box))
    assert wrapped64.dtype == np.float32 or np.allclose(wrapped64, x, atol=1e-9)
    # vector box sizes
    box3 = np.array([50.0, 100.0, 200.0])
    y = rng.uniform(-24.9, 24.9, size=(100, 3))
    wrapped3 = np.asarray(periodic_displacement(y + box3 * 2, box3))
    assert np.allclose(wrapped3, y, atol=1e-4)


def test_hubble_parameter():
    # H(0) = H0; EdS scaling at high z
    assert np.isclose(hubble_parameter(0.0, 70.0, 0.3, 0.7), 70.0)
    h = hubble_parameter(9.0, 70.0, 1.0, 0.0)
    assert np.isclose(h, 70.0 * 10**1.5)
    # curvature term
    h2 = hubble_parameter(1.0, 70.0, 0.3, 0.6, Omega_k=0.1)
    assert np.isclose(h2, 70.0 * np.sqrt(0.3 * 8 + 0.1 * 4 + 0.6))


def test_vector_norm():
    v = np.array([[3.0, 4.0, 0.0]])
    n, u = map(np.asarray, vector_norm(v, return_norm=True, return_unit_vectors=True))
    assert np.isclose(n[0], 5.0)
    assert np.allclose(u[0], [0.6, 0.8, 0.0])


def test_profiler_trace_scope(tmp_path, rng):
    """track_orbits(profile_dir=...) captures a jax.profiler trace."""
    import os

    from orbitanalysis_tpu import track_orbits
    from orbitanalysis_tpu.models.synthetic import churn_snapshots

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_callbacks

    snaps, centers = churn_snapshots(2, 60, 3, box_size=50.0, seed=3)
    regions, loader = make_callbacks(snaps, centers, box_size=50.0)
    prof = str(tmp_path / "prof")
    track_orbits(np.arange(3), np.tile([0, 1], (3, 1)), regions, loader,
                 str(tmp_path / "t.h5"), profile_dir=prof, verbose=False)
    found = []
    for root, _dirs, files in os.walk(prof):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, "no profiler artifacts written"


def test_multihost_single_process_identities():
    from orbitanalysis_tpu.parallel import multihost

    assert multihost.is_primary()
    x = np.arange(5)
    assert np.array_equal(multihost.allgather_host(x), x)
    assert multihost.broadcast_from_primary({"a": 1}) == {"a": 1}
    multihost.initialize()  # no-op single process


def test_pack_ragged_to_preallocated(rng):
    from orbitanalysis_tpu.utils import pack_ragged_to

    lens = np.array([3, 0, 5])
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    vals = rng.normal(size=int(lens.sum())).astype(np.float32)
    out = np.full((3, 8), -1.0, np.float32)
    ret = pack_ragged_to(out, vals, offsets, fill=0.0)
    assert ret is out
    assert np.array_equal(out[0, :3], vals[:3])
    assert np.array_equal(out[2, :5], vals[3:])
    assert np.all(out[1] == 0.0) and np.all(out[0, 3:] == 0.0)


def test_myin1d_matches_reference(rng):
    """The public re-export must reproduce the reference's myin1d
    (utils.py:4-11) exactly on its own contract: b's values present in
    a, no duplicates among them, result in b's order."""
    from orbitanalysis_tpu import myin1d

    def reference_myin1d(a, b, kind=None):
        loc = np.in1d(a, b, kind=kind)
        order = a[loc].argsort()[b.argsort().argsort()]
        return np.where(loc)[0][order]

    for n, m in [(50, 10), (1000, 1000), (257, 1)]:
        a = rng.permutation(n * 3)[:n]
        b = rng.permutation(a)[:m]
        got = myin1d(a, b)
        exp = reference_myin1d(a, b)
        assert np.array_equal(got, exp)
        assert np.array_equal(a[got], b)
