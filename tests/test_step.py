"""Oracle tier (SURVEY.md §4): the fused device step vs the clean-room
NumPy oracle, and vs closed-form Kepler passage counts."""

import jax
import numpy as np
import pytest

from orbitanalysis_tpu.models.synthetic import churn_snapshots, kepler_ensemble
from orbitanalysis_tpu.ops.apsis import SnapshotBatch, init_carry, make_orbit_step
from orbitanalysis_tpu.utils import INVALID_ID, pack_ragged, round_up, unpack_mask

from oracle import OracleTracker

pytestmark = pytest.mark.smoke  # <60 s core tier


def _pack(snap, n_rows, cap, with_mass=True):
    keys = sorted(snap.keys())
    rows = np.array(keys)
    ids = np.concatenate([snap[h]["ids"] for h in keys])
    lens = [len(snap[h]["ids"]) for h in keys]
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    packed_ids = pack_ragged(
        ids.astype(np.int32), offsets, n_rows, cap, rows=rows, fill=INVALID_ID
    )
    pos = pack_ragged(
        np.concatenate([snap[h]["pos"] for h in keys]).astype(np.float32),
        offsets, n_rows, cap, rows=rows,
    )
    vel = pack_ragged(
        np.concatenate([snap[h]["vel"] for h in keys]).astype(np.float32),
        offsets, n_rows, cap, rows=rows,
    )
    mass = None
    if with_mass and "mass" in snap[keys[0]]:
        mass = pack_ragged(
            np.concatenate([snap[h]["mass"] for h in keys]).astype(np.float32),
            offsets, n_rows, cap, rows=rows,
        )
    center = np.zeros((n_rows, 3), np.float32)
    center[rows] = np.stack([snap[h]["center"] for h in keys])
    return packed_ids, pos, vel, mass, center


@pytest.mark.parametrize("mode", ["pericentric", "apocentric"])
def test_step_matches_oracle_on_churn(mode):
    n_halos, n_part, n_snap = 3, 150, 8
    box = 60.0
    snaps, centers = churn_snapshots(n_halos, n_part, n_snap, box_size=box, seed=3)

    cap = round_up(n_part)
    step = jax.jit(make_orbit_step(mode=mode, box_size=box))
    carry = init_carry(n_halos, cap)
    oracle = OracleTracker(mode=mode, box_size=box)

    prev_ids = None
    for s, snap in enumerate(snaps):
        ids, pos, vel, mass, center = _pack(snap, n_halos, cap)
        batch = SnapshotBatch(
            ids=ids, pos=pos, vel=vel, center=center, mass=mass,
            bulk_vel=None, hubble_drag=0.0,
        )
        carry, events = step(carry, batch)
        oev = oracle.step(snap)

        if s > 0:
            apsis = np.asarray(events.apsis)
            angle = np.asarray(events.apsis_angle)
            offs, got_ids, got_angles = unpack_mask(apsis, prev_ids, angle)
            exp_ids = np.concatenate([oev[h][0] for h in sorted(snap)])
            exp_angles = np.concatenate([oev[h][1] for h in sorted(snap)])
            assert np.array_equal(got_ids, exp_ids), f"snapshot {s}"
            # float32 device vs float64 oracle accumulate
            assert np.allclose(got_angles, exp_angles, atol=5e-4)
        prev_ids = ids


def test_kepler_counts_analytic():
    """Pericenter detections must reproduce closed-form passage counts."""
    n_part, n_snap = 256, 40
    ens = kepler_ensemble(n_part, n_snap, seed=7)
    cap = round_up(n_part)
    step = jax.jit(make_orbit_step(mode="pericentric"))
    carry = init_carry(1, cap)

    ids_row = np.full((1, cap), INVALID_ID, np.int32)
    ids_row[0, :n_part] = ens.ids
    counts = np.zeros(n_part, dtype=np.int64)
    angle_at_apsis = []

    for s in range(n_snap):
        pos = np.zeros((1, cap, 3), np.float32)
        vel = np.zeros((1, cap, 3), np.float32)
        pos[0, :n_part] = ens.positions[s]
        vel[0, :n_part] = ens.velocities[s]
        batch = SnapshotBatch(
            ids=ids_row, pos=pos, vel=vel,
            center=np.zeros((1, 3), np.float32),
            # the ensemble's bulk velocity is ~0 but not exactly; pin it
            bulk_vel=np.zeros((1, 3), np.float32),
            mass=None, hubble_drag=0.0,
        )
        carry, events = step(carry, batch)
        if s > 0:
            apsis = np.asarray(events.apsis)[0, :n_part]
            counts += apsis
            angle_at_apsis.append(
                np.asarray(events.apsis_angle)[0, :n_part][apsis]
            )

    expected = ens.peri_counts[-1]
    assert np.array_equal(counts, expected)
    # real orbits advance ~2*pi between pericenters, far above the default
    # subhalo angle cut of pi/4 — except a particle's *first* detection,
    # which only accumulates angle since t0 and may land just after it
    all_angles = np.concatenate(angle_at_apsis)
    assert np.median(all_angles) > np.pi
    assert np.mean(all_angles > np.pi / 4) > 0.9


def test_apocenter_counts_analytic():
    n_part, n_snap = 128, 30
    ens = kepler_ensemble(n_part, n_snap, seed=11)
    cap = round_up(n_part)
    step = jax.jit(make_orbit_step(mode="apocentric"))
    carry = init_carry(1, cap)
    ids_row = np.full((1, cap), INVALID_ID, np.int32)
    ids_row[0, :n_part] = ens.ids
    counts = np.zeros(n_part, dtype=np.int64)
    for s in range(n_snap):
        pos = np.zeros((1, cap, 3), np.float32)
        vel = np.zeros((1, cap, 3), np.float32)
        pos[0, :n_part] = ens.positions[s]
        vel[0, :n_part] = ens.velocities[s]
        batch = SnapshotBatch(
            ids=ids_row, pos=pos, vel=vel,
            center=np.zeros((1, 3), np.float32),
            bulk_vel=np.zeros((1, 3), np.float32),
            mass=None, hubble_drag=0.0,
        )
        carry, events = step(carry, batch)
        if s > 0:
            counts += np.asarray(events.apsis)[0, :n_part]
    assert np.array_equal(counts, ens.apo_counts[-1])


def test_angle_accumulates_and_resets():
    """A particle on a circle with alternating vr sign flips: angles reset
    at each apsis and accumulate in between."""
    cap = 128
    step = jax.jit(make_orbit_step(mode="pericentric"))
    carry = init_carry(1, cap)
    ids = np.full((1, cap), INVALID_ID, np.int32)
    ids[0, 0] = 7
    dphi = 0.3

    def batch(phi, vr_sign):
        pos = np.zeros((1, cap, 3), np.float32)
        vel = np.zeros((1, cap, 3), np.float32)
        pos[0, 0] = [np.cos(phi), np.sin(phi), 0.0]
        # radial velocity of given sign plus tangential motion
        rhat = pos[0, 0]
        that = np.array([-np.sin(phi), np.cos(phi), 0.0])
        vel[0, 0] = vr_sign * rhat + 0.5 * that
        return SnapshotBatch(
            ids=ids, pos=pos, vel=vel, center=np.zeros((1, 3), np.float32),
            bulk_vel=np.zeros((1, 3), np.float32), mass=None, hubble_drag=0.0,
        )

    signs = [-1, -1, +1, +1, -1, +1]  # flips -+ at steps 2 and 5
    angles = []
    apsides = []
    for k, sgn in enumerate(signs):
        carry, ev = step(carry, batch(k * dphi, sgn))
        apsides.append(bool(np.asarray(ev.apsis)[0, 0]))
        angles.append(float(np.asarray(carry.angles)[0, 0]))

    assert apsides == [False, False, True, False, False, True]
    # after the first apsis the angle resets to 0, then accumulates dphi
    assert angles[2] == pytest.approx(0.0, abs=1e-6)
    assert angles[3] == pytest.approx(dphi, rel=1e-4)
    assert angles[4] == pytest.approx(2 * dphi, rel=1e-4)
    assert angles[5] == pytest.approx(0.0, abs=1e-6)
    # the recorded apsis angle at step 5 includes the whole advance since
    # the step-2 apsis
    assert float(np.asarray(ev.apsis_angle)[0, 0]) == pytest.approx(
        3 * dphi, rel=1e-4
    )


def test_static_step_equals_general_on_fixed_membership(rng):
    """With identical ID layouts, the join-free static step must produce
    the same carry and events as the general sort-merge step."""
    from orbitanalysis_tpu.ops.apsis import make_static_orbit_step

    n_halos, cap, n_valid = 3, 256, 200
    ids = np.full((n_halos, cap), INVALID_ID, np.int32)
    for h in range(n_halos):
        ids[h, :n_valid] = rng.choice(10 * cap, n_valid, replace=False)

    def batch(seed):
        r = np.random.default_rng(seed)
        return SnapshotBatch(
            ids=ids,
            pos=r.normal(size=(n_halos, cap, 3)).astype(np.float32),
            vel=r.normal(size=(n_halos, cap, 3)).astype(np.float32),
            center=r.normal(size=(n_halos, 3)).astype(np.float32),
            mass=None, bulk_vel=None, hubble_drag=np.float32(0.0),
        )

    import jax

    gen = jax.jit(make_orbit_step(mode="pericentric", box_size=100.0,
                                  event_capacity=64))
    sta = jax.jit(make_static_orbit_step(mode="pericentric", box_size=100.0,
                                         event_capacity=64))

    # seed BOTH with the general step: the static step assumes an
    # already-populated carry (the all-invalid seed carry would feed
    # arccos(0) = pi/2 into the angle accumulator), exactly mirroring the
    # tracker, which only selects the static path when the previous
    # snapshot's ID layout matches
    c_g = init_carry(n_halos, cap)
    c_s = init_carry(n_halos, cap)
    c_g, _ = gen(c_g, batch(0))
    c_s, _ = gen(c_s, batch(0))
    for k in (1, 2, 3):
        b = batch(k)
        c_g, ev_g = gen(c_g, b)
        c_s, ev_s = sta(c_s, b)
        assert np.array_equal(np.asarray(ev_g.apsis), np.asarray(ev_s.apsis)), k
        assert np.allclose(np.asarray(ev_g.apsis_angle),
                           np.asarray(ev_s.apsis_angle), atol=2e-3), k
        assert np.array_equal(np.asarray(ev_g.ev_count),
                              np.asarray(ev_s.ev_count)), k
        assert np.array_equal(np.asarray(ev_g.ev_ids),
                              np.asarray(ev_s.ev_ids)), k
        assert np.allclose(np.asarray(c_g.angles), np.asarray(c_s.angles),
                           atol=2e-3), k


@pytest.mark.parametrize("seed", range(6))
def test_step_fuzz_vs_oracle(seed):
    """Randomized differential test: random fill levels, churn rates,
    region sizes (including empty and single-particle rows) against the
    clean-room oracle."""
    from oracle import OracleTracker

    rng = np.random.default_rng(1000 + seed)
    n_halos = int(rng.integers(1, 5))
    cap = 128 * int(rng.integers(1, 3))
    box = float(rng.uniform(20, 200)) if rng.random() < 0.7 else None
    mode = "pericentric" if rng.random() < 0.5 else "apocentric"
    n_snap = int(rng.integers(3, 7))

    pools = [
        np.arange(h * 10**6, h * 10**6 + int(rng.integers(1, cap)))
        for h in range(n_halos)
    ]
    centers = rng.uniform(0, box or 100.0, size=(n_halos, 3))

    step = jax.jit(make_orbit_step(mode=mode, box_size=box))
    carry = init_carry(n_halos, cap)
    oracle = OracleTracker(mode=mode, box_size=box)

    prev_ids = None
    for s in range(n_snap):
        snap = {}
        for h in range(n_halos):
            member = rng.random(len(pools[h])) < rng.uniform(0.2, 1.0)
            ids_h = pools[h][member]
            pos = centers[h] + rng.normal(scale=3.0, size=(len(ids_h), 3))
            if box is not None:
                pos = np.mod(pos, box)
            snap[h] = dict(
                ids=ids_h,
                pos=pos,
                vel=rng.normal(size=(len(ids_h), 3)),
                mass=rng.uniform(0.5, 2.0, len(ids_h)),
                center=centers[h],
            )
        ids_p, pos_p, vel_p, mass_p, center_p = _pack(snap, n_halos, cap)
        carry, ev = step(carry, SnapshotBatch(
            ids=ids_p, pos=pos_p, vel=vel_p, center=center_p,
            mass=mass_p, bulk_vel=None, hubble_drag=0.0,
        ))
        oev = oracle.step(snap)
        if s > 0:
            apsis = np.asarray(ev.apsis)
            offs, got_ids, got_ang = unpack_mask(
                apsis, prev_ids, np.asarray(ev.apsis_angle)
            )
            exp_ids = np.concatenate([oev[h][0] for h in sorted(snap)])
            exp_ang = np.concatenate([oev[h][1] for h in sorted(snap)])
            assert np.array_equal(got_ids, exp_ids), (seed, s)
            assert np.allclose(got_ang, exp_ang, atol=5e-4), (seed, s)
        prev_ids = ids_p
