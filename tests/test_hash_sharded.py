"""Hash-sharded particle-axis tracking (parallel/hash_sharded.py):
the join stays shard-local under membership churn; events must equal
the oracle's per-halo sets exactly on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbitanalysis_tpu.models.synthetic import churn_snapshots
from orbitanalysis_tpu.parallel import make_mesh
from orbitanalysis_tpu.parallel.hash_sharded import (
    events_to_reference_order,
    flat_to_position_shards,
    init_hash_carry,
    make_device_router,
    make_hash_scan,
    make_hash_sharded_step,
    route_flat,
)

from oracle import OracleTracker

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _flatten(snap, n_halos):
    """Per-halo dict -> flat (halo, id, pos, vel[, mass]) records in the
    reference's region-major load order."""
    halos, ids, pos, vel, mass = [], [], [], [], []
    for h in range(n_halos):
        if h not in snap:
            continue
        d = snap[h]
        n = len(d["ids"])
        halos.append(np.full(n, h, np.int32))
        ids.append(np.asarray(d["ids"]))
        pos.append(np.asarray(d["pos"]))
        vel.append(np.asarray(d["vel"]))
        if d.get("mass") is not None:
            mass.append(np.asarray(d["mass"]))
    flat = dict(
        halo=np.concatenate(halos),
        ids=np.concatenate(ids),
        pos=np.concatenate(pos),
        vel=np.concatenate(vel),
    )
    if mass:
        flat["mass"] = np.concatenate(mass)
    flat["centers"] = np.stack(
        [snap[h]["center"] for h in range(n_halos)]
    ).astype(np.float32)
    return flat


@pytest.mark.parametrize("n_shards", [8, 4])
def test_hash_sharded_matches_oracle(n_shards):
    box = 60.0
    n_halos, n_part, n_snap = 3, 150, 6
    snaps, centers = churn_snapshots(
        n_halos, n_part, n_snap, box_size=box, seed=13
    )
    mesh = make_mesh({"shards": n_shards}, jax.devices()[:n_shards])
    cap = 256
    K = 128
    step = jax.jit(
        make_hash_sharded_step(
            mesh, n_halos, K, mode="pericentric", box_size=box
        )
    )
    carry = init_hash_carry(n_shards, cap, n_halos)

    oracle = OracleTracker(mode="pericentric", box_size=box)
    for s, snap in enumerate(snaps):
        flat = _flatten(snap, n_halos)
        batch = route_flat(flat, n_shards, cap)
        carry, (cnt, eh, ei, es, ea, bulk) = step(
            carry, batch, flat["centers"]
        )
        expected = oracle.step(snap)
        offsets, ids, ang = events_to_reference_order(
            cnt, eh, ei, es, ea, n_halos
        )
        for h in range(n_halos):
            got = np.sort(ids[offsets[h]:offsets[h + 1]])
            exp = np.sort(np.asarray(expected[h][0]))
            assert np.array_equal(got, exp), (s, h)
            # angles too (oracle returns [ids, angles, ...])
            got_a = ang[offsets[h]:offsets[h + 1]][
                np.argsort(ids[offsets[h]:offsets[h + 1]], kind="stable")
            ]
            exp_a = np.asarray(expected[h][1])[
                np.argsort(np.asarray(expected[h][0]), kind="stable")
            ]
            assert np.allclose(got_a, exp_a, atol=1e-4), (s, h)


def test_hash_sharded_mass_weighted_bulk():
    """Per-particle masses route through the psum'd bulk-velocity
    moments (mass-weighted mean, track_orbits.py:267-272)."""
    box = 60.0
    n_halos, n_part, n_snap = 2, 120, 4
    snaps, centers = churn_snapshots(
        n_halos, n_part, n_snap, box_size=box, seed=29
    )
    rng = np.random.default_rng(3)
    for snap in snaps:
        for h in snap:
            snap[h]["mass"] = rng.uniform(
                0.5, 4.0, len(snap[h]["ids"])
            ).astype(np.float32)
    n_shards, cap, K = 8, 128, 128
    mesh = make_mesh({"shards": n_shards}, jax.devices()[:n_shards])
    step = jax.jit(
        make_hash_sharded_step(
            mesh, n_halos, K, mode="pericentric", box_size=box
        )
    )
    carry = init_hash_carry(n_shards, cap, n_halos)
    oracle = OracleTracker(mode="pericentric", box_size=box)
    for s, snap in enumerate(snaps):
        flat = _flatten(snap, n_halos)
        batch = route_flat(flat, n_shards, cap)
        carry, (cnt, eh, ei, es, ea, bulk) = step(
            carry, batch, flat["centers"]
        )
        expected = oracle.step(snap)
        offsets, ids, _ = events_to_reference_order(
            cnt, eh, ei, es, ea, n_halos
        )
        for h in range(n_halos):
            got = np.sort(ids[offsets[h]:offsets[h + 1]])
            exp = np.sort(np.asarray(expected[h][0]))
            assert np.array_equal(got, exp), (s, h)


def test_device_router_matches_host_router():
    """The all_to_all ownership router must reproduce route_flat's
    [D, cap] blocks bit-for-bit: consecutive position chunks preserve
    global load order within each destination bucket."""
    rng = np.random.default_rng(5)
    n, D, cap = 1000, 8, 256
    flat = dict(
        halo=rng.integers(0, 3, n).astype(np.int32),
        ids=rng.permutation(5000)[:n].astype(np.int64),
        pos=rng.normal(size=(n, 3)).astype(np.float32),
        vel=rng.normal(size=(n, 3)).astype(np.float32),
        mass=rng.uniform(0.5, 2.0, n).astype(np.float32),
    )
    host = route_flat(flat, D, cap)
    mesh = make_mesh({"shards": D})
    route = jax.jit(make_device_router(mesh, cap))
    dev, dropped = route(flat_to_position_shards(flat, D))
    assert int(np.sum(np.asarray(dropped))) == 0
    for name in ("halo", "ids", "slot", "pos", "vel", "mass"):
        a = np.asarray(getattr(host, name))
        b = np.asarray(getattr(dev, name))
        assert np.array_equal(a, b), name


def test_device_router_overflow_fail_loud():
    """Bucket overflow must be *reported*, not silent: all IDs landing
    on one shard with a too-small block width drops records and the
    dropped counts say so."""
    n, D = 64, 8
    flat = dict(
        halo=np.zeros(n, np.int32),
        ids=(np.arange(n) * D).astype(np.int64),  # all on shard 0
        pos=np.zeros((n, 3), np.float32),
        vel=np.zeros((n, 3), np.float32),
    )
    mesh = make_mesh({"shards": D})
    route = jax.jit(make_device_router(mesh, cap=64, block=8))
    _, dropped = route(flat_to_position_shards(flat, D))
    # 64 records -> 8 sources x block 8 = exactly fits; shrink block
    route2 = jax.jit(make_device_router(mesh, cap=32, block=4))
    _, dropped2 = route2(flat_to_position_shards(flat, D))
    assert int(np.sum(np.asarray(dropped))) == 0
    assert int(np.sum(np.asarray(dropped2))) == n - D * 4


def test_hash_scan_matches_oracle():
    """Scan-resident sequence driver (device-side all_to_all routing,
    one lax.scan, no host in the loop) must equal the oracle's per-halo
    event sets and angles, like the per-step path."""
    box = 60.0
    n_halos, n_part, n_snap = 3, 150, 6
    snaps, centers = churn_snapshots(
        n_halos, n_part, n_snap, box_size=box, seed=13
    )
    D, cap, K = 8, 256, 128
    mesh = make_mesh({"shards": D})

    flats = [_flatten(s, n_halos) for s in snaps]
    L = -(-max(len(f["ids"]) for f in flats) // D)
    seqs = [flat_to_position_shards(f, D, pad_to=L) for f in flats]
    flat_seq = jax.tree.map(lambda *xs: jnp.stack(xs), *seqs)
    centers_seq = np.stack([f["centers"] for f in flats])

    scan = jax.jit(make_hash_scan(
        mesh, n_halos, K, cap, mode="pericentric", box_size=box
    ))
    carry = init_hash_carry(D, cap, n_halos)
    carry, evs, dropped = scan(carry, flat_seq, centers_seq)
    assert int(np.sum(np.asarray(dropped))) == 0

    oracle = OracleTracker(mode="pericentric", box_size=box)
    for s, snap in enumerate(snaps):
        expected = oracle.step(snap)
        offsets, ids, ang = events_to_reference_order(
            np.asarray(evs.count[s]), np.asarray(evs.halo[s]),
            np.asarray(evs.ids[s]), np.asarray(evs.slots[s]),
            np.asarray(evs.angles[s]), n_halos,
        )
        for h in range(n_halos):
            got = np.sort(ids[offsets[h]:offsets[h + 1]])
            exp = np.sort(np.asarray(expected[h][0]))
            assert np.array_equal(got, exp), (s, h)
            got_a = ang[offsets[h]:offsets[h + 1]][
                np.argsort(ids[offsets[h]:offsets[h + 1]], kind="stable")
            ]
            exp_a = np.asarray(expected[h][1])[
                np.argsort(np.asarray(expected[h][0]), kind="stable")
            ]
            assert np.allclose(got_a, exp_a, atol=1e-4), (s, h)


def test_route_flat_capacity_guard():
    flat = dict(
        halo=np.zeros(16, np.int32),
        ids=np.arange(16) * 8,  # all land on shard 0
        pos=np.zeros((16, 3), np.float32),
        vel=np.zeros((16, 3), np.float32),
    )
    with pytest.raises(ValueError, match="shard capacity"):
        route_flat(flat, 8, 8)


def test_wide_id_map_deterministic_and_stable():
    """WideIdMap: persistent handles (same id -> same handle across
    calls), dense int32 range, exact inverse, deterministic assignment."""
    from orbitanalysis_tpu.parallel.hash_sharded import WideIdMap

    rng = np.random.default_rng(7)
    m = WideIdMap()
    a = rng.choice(2**40, size=500, replace=False).astype(np.int64)
    h1 = m.map(a)
    assert h1.dtype == np.int32 and len(np.unique(h1)) == len(a)
    np.testing.assert_array_equal(m.unmap(h1), a)
    # overlap + new ids: survivors keep their handles
    b = np.concatenate([a[100:200], a[300:] + 1])
    h2 = m.map(b)
    np.testing.assert_array_equal(h2[:100], h1[100:200])
    np.testing.assert_array_equal(m.unmap(h2), b)
    # a second map built from the same stream assigns identically
    m2 = WideIdMap()
    np.testing.assert_array_equal(m2.map(a), h1)
    np.testing.assert_array_equal(m2.map(b), h2)
    with pytest.raises(ValueError, match="negative"):
        m.map(np.array([-1], np.int64))
