"""Native tier: the C++ ragged packer vs the NumPy reference path."""

import numpy as np
import pytest

from orbitanalysis_tpu import native
from orbitanalysis_tpu.utils import INVALID_ID


@pytest.fixture(scope="module")
def lib():
    if native.ensure() is None:
        pytest.skip("no C++ toolchain available")
    return native


@pytest.mark.parametrize("dtype,elem", [
    (np.int32, ()), (np.float32, ()), (np.float32, (3,)), (np.int64, ()),
])
def test_native_pack_matches_numpy(lib, rng, dtype, elem):
    lens = np.array([5, 0, 900, 37, 128, 1])
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    total = int(lens.sum())
    shape = (total,) + elem
    if np.issubdtype(dtype, np.integer):
        values = rng.integers(0, 1 << 20, size=shape).astype(dtype)
        fill = INVALID_ID
    else:
        values = rng.normal(size=shape).astype(dtype)
        fill = 0.0
    rows = np.array([0, 2, 1, 5, 3, 4])
    cap = 1024

    got = lib.pack_ragged_native(values, offsets, 6, cap, rows, fill)
    assert got is not None

    out_shape = (6, cap) + elem
    expect = np.full(out_shape, fill, dtype=dtype)
    for b in range(6):
        expect[rows[b], : lens[b]] = values[offsets[b]: offsets[b] + lens[b]]
    assert np.array_equal(got, expect)


def test_padding_dispatches_to_native_above_threshold(lib, rng):
    from orbitanalysis_tpu.utils.padding import pack_ragged

    n = 600_000  # > 1 MiB of float32 -> native path
    lens = np.array([n // 2, n // 2])
    offsets = np.array([0, n // 2])
    values = rng.normal(size=n).astype(np.float32)
    out = pack_ragged(values, offsets, 2, n // 2 + 128, fill=0.0)
    assert np.array_equal(out[0, : n // 2], values[: n // 2])
    assert np.array_equal(out[1, : n // 2], values[n // 2:])
    assert np.all(out[:, n // 2:] == 0)


def test_grid_count_sort_matches_numpy(rng):
    from orbitanalysis_tpu import native

    if native.ensure() is None:
        import pytest
        pytest.skip("no compiler")
    flat = rng.integers(0, 777, 50000)
    out = native.grid_count_sort_native(flat, 777)
    assert out is not None
    starts, order = out
    exp_order = np.argsort(flat, kind="stable")
    np.testing.assert_array_equal(order, exp_order)
    np.testing.assert_array_equal(
        starts, np.searchsorted(flat[exp_order], np.arange(778))
    )


def test_stable_align_matches_numpy(lib, rng):
    """Native stable_align vs the NumPy StableLayout path: identical
    layouts, scatters, and slot permutations over a churned sequence
    (including a first all-entrant snapshot and a no-mass snapshot)."""
    from orbitanalysis_tpu.engine import packing
    from orbitanalysis_tpu.utils.padding import invalid_id_for

    inv = invalid_id_for(np.int32)
    H, P = 3, 512
    pool = np.arange(P * 3, dtype=np.int32)

    def snap(members, with_mass=True):
        ids = np.full((H, P), inv, np.int32)
        for h, m in enumerate(members):
            ids[h, : len(m)] = m
        pos = rng.normal(size=(H, P, 3)).astype(np.float32)
        vel = rng.normal(size=(H, P, 3)).astype(np.float32)
        mass = (
            rng.random((H, P)).astype(np.float32) if with_mass else None
        )
        return ids, pos, vel, mass

    members = [
        rng.choice(pool, size=rng.integers(P // 2, P), replace=False)
        for _ in range(H)
    ]
    lay_np = packing.StableLayout(H, P)
    lay_nat = packing.StableLayout(H, P)
    for s in range(4):
        snap_s = snap(members, with_mass=(s != 2))
        # churn ~10%: drop some, add some, shuffle survivor order
        members = [
            np.concatenate([
                m[rng.random(len(m)) > 0.1],
                rng.choice(
                    np.setdiff1d(pool, m), size=len(m) // 8, replace=False
                ),
            ])
            for m in members
        ]
        for m in members:
            rng.shuffle(m)

        got = packing.align_packed(lay_nat, *snap_s)
        orig = native.stable_align_native
        native.stable_align_native = lambda *a, **k: None
        try:
            exp = packing.align_packed(lay_np, *snap_s)
        finally:
            native.stable_align_native = orig
        assert np.array_equal(lay_np.layout, lay_nat.layout), s
        for name, x, y in zip("ids pos vel mass slot".split(), exp, got):
            if x is None:
                assert y is None
                continue
            assert np.array_equal(x, y), (s, name)


def test_region_extractor_native_index(rng):
    """RegionExtractor over the native-sort threshold must agree with a
    small (numpy-path) extractor on the same data."""
    from orbitanalysis_tpu import native
    from orbitanalysis_tpu.engine.regions import RegionExtractor

    if native.ensure() is None:
        import pytest
        pytest.skip("no compiler")
    n = (1 << 18) + 17
    box = 100.0
    ids = np.arange(n, dtype=np.int64)
    pos = rng.uniform(0, box, size=(n, 3))
    vel = rng.normal(size=(n, 3))
    ex = RegionExtractor(ids, pos, vel, box_size=box)
    centers = rng.uniform(0, box, size=(3, 3))
    radii = np.full(3, 7.0)
    got = ex.extract(centers, radii)
    # oracle: brute force per region
    offs = np.concatenate((got["region_offsets"], [len(got["ids"])]))
    for j, (c, r) in enumerate(zip(centers, radii)):
        d = pos - c
        d -= box * np.round(d / box)
        exp = set(ids[(d * d).sum(1) < r * r].tolist())
        assert set(got["ids"][offs[j]:offs[j + 1]].tolist()) == exp


@pytest.mark.parametrize("soa", [False, True])
def test_stable_align_soa_and_out_buffers(lib, rng, soa):
    """The soa= plane layout and out= caller-buffer paths match the
    default allocation path exactly, on both the native and the NumPy
    implementation (persistent staging buffers + [3, H, P] planes are
    what stage_batch_aligned feeds the device)."""
    from orbitanalysis_tpu.engine import packing
    from orbitanalysis_tpu.utils.padding import invalid_id_for

    inv = invalid_id_for(np.int32)
    H, P = 3, 256
    ids = np.full((H, P), inv, np.int32)
    for h in range(H):
        n = int(rng.integers(P // 2, P - 3))
        ids[h, :n] = rng.choice(5000, n, replace=False)
    pos = rng.normal(size=(H, P, 3)).astype(np.float32)
    vel = rng.normal(size=(H, P, 3)).astype(np.float32)
    mass = rng.random((H, P)).astype(np.float32)
    vshape = (3, H, P) if soa else (H, P, 3)
    perm = rng.permutation(P)

    def run(use_native, out):
        lay = packing.StableLayout(H, P)
        orig = native.stable_align_native
        if not use_native:
            native.stable_align_native = lambda *a, **k: None
        try:
            # two snapshots: all-entrants, then survivors-only reorder
            packing.align_packed(lay, ids, pos, vel, mass, soa=soa)
            res = packing.align_packed(
                lay, ids[:, perm],
                np.ascontiguousarray(pos[:, perm]),
                np.ascontiguousarray(vel[:, perm]),
                np.ascontiguousarray(mass[:, perm]),
                out=out, soa=soa,
            )
        finally:
            native.stable_align_native = orig
        return res, lay.layout

    base, base_lay = run(True, None)
    assert base[1].shape == vshape
    for use_native in (True, False):
        out = (
            np.zeros((H, P), np.int32),
            np.zeros(vshape, np.float32),
            np.zeros(vshape, np.float32),
            np.zeros((H, P), np.float32),
            np.zeros((H, P), np.int32),
        )
        got, got_lay = run(use_native, out)
        assert got[0] is out[0]  # scattered in place
        assert np.array_equal(got_lay, base_lay), use_native
        for name, x, y in zip("ids pos vel mass slot".split(), base, got):
            assert np.array_equal(x, y), (use_native, name)

    # malformed out buffers fail loudly on the native path
    bad = (
        np.zeros((H, P), np.int32),
        np.zeros((H, P, 3) if soa else (3, H, P), np.float32),  # wrong
        np.zeros(vshape, np.float32),
        np.zeros((H, P), np.float32),
        np.zeros((H, P), np.int32),
    )
    lay = packing.StableLayout(H, P)
    with pytest.raises(ValueError, match="out buffer"):
        packing.align_packed(lay, ids, pos, vel, mass, out=bad, soa=soa)
