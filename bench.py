"""Benchmark: particle-snapshot orbit updates/sec/chip.

Times the framework's fused per-snapshot orbit step driven by the
``lax.scan`` sequence driver (:mod:`orbitanalysis_tpu.engine.scan`) on the
default JAX device, against a clean-room NumPy implementation of the
reference algorithm's per-halo snapshot loop (the cost profile of
``/root/reference/orbitanalysis/track_orbits.py:247-351``: per-halo
recenter + bulk velocity + radial velocity, double-argsort ID join,
sign-flip detection, angle accumulate) measured on the same machine.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ----------------------------------------------------------------------
# synthetic benchmark data: smooth orbital motion, fixed membership
# ----------------------------------------------------------------------

def make_sequence(n_halos, capacity, n_snaps, seed=0):
    """[S]-stacked SnapshotBatch of particles on noisy circular orbits."""
    rng = np.random.default_rng(seed)
    center = rng.uniform(20.0, 80.0, size=(n_halos, 3)).astype(np.float32)
    r0 = rng.uniform(0.5, 5.0, size=(n_halos, capacity)).astype(np.float32)
    omega = (1.0 / r0**1.5).astype(np.float32)
    phase0 = rng.uniform(0, 2 * np.pi, size=(n_halos, capacity)).astype(
        np.float32
    )
    axis_x = rng.normal(size=(n_halos, capacity, 3)).astype(np.float32)
    axis_x /= np.linalg.norm(axis_x, axis=-1, keepdims=True)
    tmp = rng.normal(size=(n_halos, capacity, 3)).astype(np.float32)
    tmp -= (tmp * axis_x).sum(-1, keepdims=True) * axis_x
    axis_y = (tmp / np.linalg.norm(tmp, axis=-1, keepdims=True)).astype(
        np.float32
    )

    ids = np.arange(n_halos * capacity, dtype=np.int32).reshape(
        n_halos, capacity
    )
    # shuffle within rows so the join's sort does real work
    for h in range(n_halos):
        ids[h] = ids[h][np.argsort(rng.random(capacity), kind="stable")]

    # eccentric-like orbits: radial breathing on top of the circular
    # motion gives every particle a well-defined v_r sign (pure circular
    # orbits have v_r ~ 0, so sign flips would be numerical noise),
    # with random phases so apsis events spread across snapshots
    ecc = rng.uniform(0.2, 0.5, size=(n_halos, capacity)).astype(np.float32)
    phase_r = rng.uniform(0, 2 * np.pi, size=(n_halos, capacity)).astype(
        np.float32
    )
    dt = np.float32(0.3)
    pos = np.empty((n_snaps, n_halos, capacity, 3), dtype=np.float32)
    vel = np.empty_like(pos)
    for s in range(n_snaps):
        ph = phase0 + omega * (s * dt)
        phr = phase_r + omega * (s * dt)
        r = r0 * (1.0 + ecc * np.sin(phr))
        rdot = r0 * ecc * omega * np.cos(phr)
        cph, sph = np.cos(ph), np.sin(ph)
        pos[s] = (
            center[:, None, :]
            + r[..., None] * (cph[..., None] * axis_x
                              + sph[..., None] * axis_y)
        )
        vel[s] = (
            rdot[..., None] * (cph[..., None] * axis_x
                               + sph[..., None] * axis_y)
            + (r * omega)[..., None] * (
                -sph[..., None] * axis_x + cph[..., None] * axis_y
            )
        )
    ids_seq = np.broadcast_to(ids, (n_snaps, n_halos, capacity))
    centers_seq = np.broadcast_to(center, (n_snaps, n_halos, 3))
    return ids_seq, pos, vel, centers_seq


# ----------------------------------------------------------------------
# NumPy baseline: reference-style per-halo loop (clean-room)
# ----------------------------------------------------------------------

def _myin1d(a, b):
    """Indices into ``a`` of the values ``b`` (all present), in b's order
    — the reference's double-argsort idiom (``utils.py:4-11``)."""
    return np.argsort(a)[np.argsort(np.argsort(b))] if len(a) else b

def numpy_baseline_updates_per_s(ids_seq, pos_seq, vel_seq, centers_seq,
                                 box=100.0):
    n_snaps, n_halos, npart = ids_seq.shape
    t0 = time.perf_counter()
    n_events = 0
    prev = [None] * n_halos
    for s in range(n_snaps):
        for h in range(n_halos):
            ids = ids_seq[s, h]
            rel = pos_seq[s, h] - centers_seq[s, h]
            rel -= box * np.round(rel / box)
            bulk = vel_seq[s, h].mean(0)
            vrel = vel_seq[s, h] - bulk
            r = np.sqrt(np.einsum("ij,ij->i", rel, rel))
            rhat = rel / r[:, None]
            vr = np.einsum("ij,ij->i", vrel, rhat)
            if prev[h] is not None:
                ids0, vr0, rhat0, ang0 = prev[h]
                in_prev = np.isin(ids, ids0)
                matched = ids[in_prev]
                ci = _myin1d(ids, matched)
                pi = _myin1d(ids0, matched)
                flip = (vr0[pi] < 0) & (vr[ci] > 0)
                dth = np.arccos(
                    np.clip(
                        np.einsum("ij,ij->i", rhat0[pi], rhat[ci]), -1, 1
                    )
                )
                ang = np.zeros(npart, dtype=np.float32)
                ang[ci] = ang0[pi] + dth
                n_events += int(flip.sum())
                ang_new = ang
                ang_new[ci[flip]] = 0.0
            else:
                ang_new = np.zeros(npart, dtype=np.float32)
            prev[h] = (ids, vr, rhat, ang_new)
    dt = time.perf_counter() - t0
    updates = (n_snaps - 1) * n_halos * npart
    return updates / dt, n_events


# ----------------------------------------------------------------------
# device path
# ----------------------------------------------------------------------

def device_updates_per_s(ids_seq, pos_seq, vel_seq, centers_seq,
                         box=100.0, repeats=3):
    import jax
    import jax.numpy as jnp

    from orbitanalysis_tpu.engine.scan import scan_events_sorted
    from orbitanalysis_tpu.ops.apsis import SnapshotBatch
    from orbitanalysis_tpu.ops.sorted_step import (
        init_sorted_carry,
        presort_snapshot,
    )

    n_snaps, n_halos, capacity = ids_seq.shape
    snaps = SnapshotBatch(
        ids=np.ascontiguousarray(ids_seq),
        pos=pos_seq,
        vel=vel_seq,
        center=np.ascontiguousarray(centers_seq),
        mass=None,
        bulk_vel=None,
        hubble_drag=np.zeros(n_snaps, dtype=np.float32),
    )
    # Staged layout contract: halo rows are ID-sorted at staging time
    # (host side, like the padding/packing itself) with original load
    # slots riding a slot channel — event output order is unchanged.
    # The per-step device join is then a VMEM-resident bitonic merge +
    # log-shift compaction (Pallas), no full sorting network anywhere.
    snaps = jax.tree.map(jnp.asarray, presort_snapshot(snaps, soa=True))
    carry0 = init_sorted_carry(n_halos, capacity)

    # On-device event compaction: the scan emits [S, H, K] event lists
    # + counts (what the savefile writer consumes) instead of full
    # [S, H, P] masks.  Timing is fetch-to-fetch on a scalar (on
    # tunneled devices `block_until_ready` does not reliably wait); the
    # compact event tensors stay jit outputs so they are really
    # materialized.
    # event capacity: ample headroom over the per-halo event rate
    # (overflowing rows are detectable via cnt > K and re-run)
    K = max(128, capacity // 16)

    def run(c, s):
        carry, (cnt, ids, angles) = scan_events_sorted(
            c, s, K, mode="pericentric", box_size=box,
            fused=True, cur_presorted=True, soa_batch=True,
        )
        return jnp.sum(cnt), jnp.max(cnt), ids, angles

    fn = jax.jit(run)
    out = fn(carry0, snaps)  # compile + warm-up
    events = int(np.asarray(out[0]))
    assert int(np.asarray(out[1])) <= K, "event capacity overflow in bench"

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        n_ev, _mx, _ids, _angles = fn(carry0, snaps)
        n_ev = int(np.asarray(n_ev))
        best = min(best, time.perf_counter() - t0)
    updates = n_snaps * n_halos * capacity
    return updates / best, events, best


def main():
    import jax

    platform = jax.devices()[0].platform
    log(f"platform: {platform} ({len(jax.devices())} device(s))")

    if platform == "tpu":
        n_halos, capacity, n_snaps = 64, 32768, 48   # 100M updates / scan
    else:
        n_halos, capacity, n_snaps = 8, 2048, 8

    log(f"config: H={n_halos} P={capacity} S={n_snaps}")
    ids_seq, pos_seq, vel_seq, centers_seq = make_sequence(
        n_halos, capacity, n_snaps
    )

    ups, events, t = device_updates_per_s(
        ids_seq, pos_seq, vel_seq, centers_seq
    )
    log(f"device: {ups:.3e} updates/s ({events} apsis events, {t:.3f} s/scan)")

    # baseline on a slice small enough to finish quickly, same layout
    bh, bp, bs = min(n_halos, 8), min(capacity, 4096), min(n_snaps, 6)
    b_ups, b_events = numpy_baseline_updates_per_s(
        ids_seq[:bs, :bh, :bp],
        pos_seq[:bs, :bh, :bp],
        vel_seq[:bs, :bh, :bp],
        centers_seq[:bs, :bh],
    )
    log(f"numpy baseline: {b_ups:.3e} updates/s ({b_events} events)")

    print(json.dumps({
        "metric": "orbit_updates_per_sec_per_chip",
        "value": round(ups, 1),
        "unit": "particle-snapshot updates/s",
        "vs_baseline": round(ups / b_ups, 2),
    }))


if __name__ == "__main__":
    main()
