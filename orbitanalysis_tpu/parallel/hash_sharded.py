"""Hash-sharded particle-axis tracking: the full-box scale path.

The halo-sharded paths put *whole halo rows* on one device — fine until
a single snapshot's tracked set outgrows one chip.  This module shards
the flat (halo, particle) pool by ``id % n_shards`` instead (SURVEY.md
§7 "shard the particle axis by hash(id)"):

- the prev/cur **ID join is shard-local by construction** — a particle's
  records land on the same shard every snapshot, whichever halo region
  it sits in, so membership churn and region migration
  (``/root/reference/orbitanalysis/track_orbits.py:300-309``) never
  move carry state between devices;
- the only collectives per step are a ``psum`` of the per-halo
  bulk-velocity moments (``[H, 3]`` + ``[H]`` — tiny against ICI) and
  the host's initial routing of each snapshot to its owner shards;
- per-device cost is ``O(N/D log(N/D))`` sort work and ``O(N/D)``
  memory — the particle axis scales linearly with the mesh.

Records are keyed by (halo, id) pairs, so a particle sitting in two
overlapping halo regions is two independent records (the reference's
per-halo independence), and a particle leaving region A for region B is
a departure + an entry, never a cross-halo angle carry-over.

Workflow::

    mesh   = make_mesh({"shards": D})
    step   = make_hash_sharded_step(mesh, event_capacity=K, mode=...)
    carry  = init_hash_carry(D, C)                     # [D, C] pools
    batch  = route_flat(flat_snapshot, D, C)           # host bucketing
    carry, ev = jax.jit(step)(carry, batch)            # events [D, K]

Event order: events ride (halo, prev-load-slot) so the host restores
the reference's exact per-halo output order by one small sort.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map
    _SHARD_MAP_KW = {"check_vma": False}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
    _SHARD_MAP_KW = {"check_rep": False}

from orbitanalysis_tpu.utils.numerics import periodic_displacement

_INVALID = np.int32(np.iinfo(np.int32).max)


class WideIdMap:
    """Persistent wide (e.g. Gadget uint64) particle-ID -> dense int32
    handle mapping for the hash engine — the position-surrogate idea
    from the aligned engine (``engine/tracker.py``) adapted to a
    record-pool engine whose device join keys on the ID itself: the
    device only ever needs keys that are *stable and unique per
    particle*, not the real 64-bit values, so the host hands out dense
    int32 handles on first sight and maps event handles back to real
    IDs at write time (loader contract
    ``/root/reference/orbitanalysis/track_orbits.py:44-47``).

    Handles are deterministic given the snapshot stream (assigned in
    sorted order per batch of unseen IDs), and routing by
    ``handle % n_shards`` is stable across snapshots because handles
    are persistent.  A resumed run rebuilds an equivalent map from the
    resume snapshot onward — handles never cross run boundaries (the
    savefile and checkpoint carry only real IDs / load-order state).
    """

    def __init__(self):
        self._sorted = np.empty(0, np.int64)   # known ids, ascending
        self._handle = np.empty(0, np.int32)   # handle per sorted id
        self.inverse = np.empty(0, np.int64)   # handle -> id

    def map(self, ids) -> np.ndarray:
        """int32 handles for ``ids`` (assigning new handles to unseen
        values)."""
        ids = np.asarray(ids, np.int64)
        if ids.size and ids.min() < 0:
            raise ValueError(
                "negative particle IDs are not supported; remap IDs to "
                ">= 0 in the loader"
            )
        if len(self._sorted):
            idx = np.searchsorted(self._sorted, ids)
            idxc = np.minimum(idx, len(self._sorted) - 1)
            found = self._sorted[idxc] == ids
        else:
            found = np.zeros(len(ids), bool)
        new = np.unique(ids[~found])
        if len(new):
            base = len(self.inverse)
            if base + len(new) >= np.iinfo(np.int32).max - 1:
                raise ValueError(
                    "wide-ID handle space exhausted (>= 2^31-2 distinct "
                    "particles on one tracker)"
                )
            handles_new = np.arange(
                base, base + len(new), dtype=np.int32
            )
            self.inverse = np.concatenate([self.inverse, new])
            merged = np.concatenate([self._sorted, new])
            mh = np.concatenate([self._handle, handles_new])
            order = np.argsort(merged, kind="stable")
            self._sorted = merged[order]
            self._handle = mh[order]
            idx = np.searchsorted(self._sorted, ids)
        return self._handle[idx] if len(self._sorted) else (
            np.empty(0, np.int32)
        )

    def unmap(self, handles) -> np.ndarray:
        """Real wide IDs for int32 ``handles``."""
        return self.inverse[np.asarray(handles, np.int64)]


class HashCarry(NamedTuple):
    """Per-shard particle state, [D, C] (one row per shard)."""

    halo: jnp.ndarray    # [D, C] int32 halo row (n_halos = padding)
    ids: jnp.ndarray     # [D, C] int32 particle id (invalid = padding)
    slot: jnp.ndarray    # [D, C] int32 global load slot of last snapshot
    vrad: jnp.ndarray    # [D, C] f32 radial velocity
    rhat: jnp.ndarray    # [D, C, 3] f32
    angles: jnp.ndarray  # [D, C] f32 accumulated angle


class HashEvents(NamedTuple):
    """Per-step events, one row per shard (exact counts, K-wide lists)."""

    count: jnp.ndarray     # [D] int32
    halo: jnp.ndarray      # [D, K] int32
    ids: jnp.ndarray       # [D, K] int32
    slots: jnp.ndarray     # [D, K] int32 prev global load slot
    angles: jnp.ndarray    # [D, K]
    bulk_vel: jnp.ndarray  # [H, 3] (replicated)


class HashBatch(NamedTuple):
    """One routed snapshot, [D, C] per-shard blocks (host-built)."""

    halo: jnp.ndarray    # [D, C] int32
    ids: jnp.ndarray     # [D, C] int32
    slot: jnp.ndarray    # [D, C] int32 global load slot
    pos: jnp.ndarray     # [D, C, 3] f32
    vel: jnp.ndarray     # [D, C, 3] f32
    mass: Optional[jnp.ndarray] = None  # [D, C] f32


def init_hash_carry(n_shards: int, cap: int, n_halos: int) -> HashCarry:
    return HashCarry(
        halo=jnp.full((n_shards, cap), n_halos, jnp.int32),
        ids=jnp.full((n_shards, cap), _INVALID, jnp.int32),
        slot=jnp.zeros((n_shards, cap), jnp.int32),
        vrad=jnp.zeros((n_shards, cap), jnp.float32),
        rhat=jnp.zeros((n_shards, cap, 3), jnp.float32),
        angles=jnp.zeros((n_shards, cap), jnp.float32),
    )


def route_flat(flat: dict, n_shards: int, cap: int,
               id_map: Optional[WideIdMap] = None) -> HashBatch:
    """Host-side bucketing of a flat (halo, id, pos, vel[, mass]) record
    list into ``[n_shards, cap]`` padded blocks by ``id % n_shards``.

    ``flat['slot']`` defaults to the record's position — the reference's
    load order (region-major), which the event path preserves.
    ``id_map``: a :class:`WideIdMap` translating wide (64-bit) IDs to
    dense int32 device handles (events come back as handles; unmap at
    write time).
    """
    ids = np.asarray(flat["ids"], dtype=np.int64)
    if id_map is not None:
        ids = id_map.map(ids).astype(np.int64)
    if ids.size and (ids.min() < 0 or ids.max() >= 2**31 - 1):
        raise ValueError(
            "hash-sharded tracking stores particle IDs as int32; pass "
            "id_dtype=np.int64 to track_orbits (dense int32 handles via "
            "WideIdMap) or remap IDs into [0, 2^31-1) in the loader"
        )
    n = len(ids)
    halo = np.asarray(flat["halo"], dtype=np.int32)
    slot = np.asarray(
        flat.get("slot", np.arange(n, dtype=np.int64)), dtype=np.int64
    )
    pos = np.asarray(flat["pos"], dtype=np.float32)
    vel = np.asarray(flat["vel"], dtype=np.float32)
    mass = flat.get("mass")

    shard = (ids % n_shards).astype(np.int64)
    order = np.argsort(shard, kind="stable")
    counts = np.bincount(shard, minlength=n_shards)
    if counts.max(initial=0) > cap:
        raise ValueError(
            f"shard capacity {cap} < largest bucket {int(counts.max())}; "
            "raise cap (hash imbalance is O(sqrt) — a few % headroom)"
        )

    def alloc(shape, fill, dtype):
        return np.full((n_shards, cap) + shape, fill, dtype)

    out_halo = alloc((), 0, np.int32)
    out_ids = alloc((), _INVALID, np.int32)
    out_slot = alloc((), 0, np.int32)
    out_pos = alloc((3,), 0, np.float32)
    out_vel = alloc((3,), 0, np.float32)
    out_mass = alloc((), 1, np.float32) if mass is not None else None

    starts = np.concatenate(([0], np.cumsum(counts)))
    # positions within each bucket, in routed (stable load) order
    col = np.arange(n) - starts[shard[order]]
    rows = shard[order]
    out_halo[rows, col] = halo[order]
    out_ids[rows, col] = ids[order].astype(np.int32)
    out_slot[rows, col] = slot[order].astype(np.int32)
    out_pos[rows, col] = pos[order]
    out_vel[rows, col] = vel[order]
    if out_mass is not None:
        out_mass[rows, col] = np.asarray(mass, np.float32)[order]
    return HashBatch(
        halo=jnp.asarray(out_halo),
        ids=jnp.asarray(out_ids),
        slot=jnp.asarray(out_slot),
        pos=jnp.asarray(out_pos),
        vel=jnp.asarray(out_vel),
        mass=None if out_mass is None else jnp.asarray(out_mass),
    )


def _make_local_step(
    n_halos: int,
    event_capacity: int,
    pericentric: bool,
    box_size,
    angle_dtype,
    axis: str,
):
    """Shard-local step body (runs inside ``shard_map``): join + detect
    on this shard's [1, C] carry/batch rows; the only collective is the
    ``psum`` of the bulk-velocity moments.  Shared by the per-step
    wrapper (:func:`make_hash_sharded_step`) and the scan-resident
    driver (:func:`make_hash_scan`)."""
    K = int(event_capacity)
    H = int(n_halos)

    def local_step(carry, batch, centers, bulk_cat, hubble_drag):
        # leading [1, ...] shard block -> local views
        halo_c = batch.halo[0]
        ids_c = batch.ids[0]
        slot_c = batch.slot[0]
        pos = batch.pos[0]
        vel = batch.vel[0]
        mass = None if batch.mass is None else batch.mass[0]
        valid_c = ids_c != _INVALID
        C = ids_c.shape[0]

        # ---- per-halo bulk velocity: local segment moments + psum ----
        if bulk_cat is None:
            w = (
                jnp.where(valid_c, mass, 0.0)
                if mass is not None
                else valid_c.astype(jnp.float32)
            )
            seg = jnp.where(valid_c, halo_c, H)
            mom = jax.ops.segment_sum(
                w[:, None] * vel, seg, num_segments=H + 1
            )
            tot = jax.ops.segment_sum(w, seg, num_segments=H + 1)
            mom = jax.lax.psum(mom, axis)
            tot = jax.lax.psum(tot, axis)
            bulk = mom[:H] / jnp.maximum(tot[:H], 1e-30)[:, None]
        else:
            bulk = bulk_cat

        # ---- region frame (flat records; center/bulk looked up by
        # halo — tiny [H, 3] tables, gathers are fine at this width) ----
        halo_ix = jnp.minimum(halo_c, H - 1)
        rel = pos - centers[halo_ix]
        if box_size is not None:
            rel = periodic_displacement(rel, box_size)
        vrel = vel - bulk[halo_ix] + hubble_drag * rel
        r2 = jnp.sum(rel * rel, axis=-1)
        rinv = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-30)), 0.0)
        rhat = rel * rinv[:, None]
        vr = jnp.sum(vrel * rhat, axis=-1)

        # ---- shard-local sort-merge join on (halo, id, side) ----
        halo_p = carry.halo[0]
        ids_p = carry.ids[0]
        side = jnp.concatenate(
            [jnp.zeros(C, jnp.int32), jnp.ones(C, jnp.int32)]
        )
        m_halo = jnp.concatenate([halo_p, jnp.where(valid_c, halo_c, H)])
        m_ids = jnp.concatenate([ids_p, ids_c])
        m_slot = jnp.concatenate([carry.slot[0], slot_c])
        m_vr = jnp.concatenate([carry.vrad[0], vr])
        m_rx = jnp.concatenate([carry.rhat[0, :, 0], rhat[:, 0]])
        m_ry = jnp.concatenate([carry.rhat[0, :, 1], rhat[:, 1]])
        m_rz = jnp.concatenate([carry.rhat[0, :, 2], rhat[:, 2]])
        m_ang = jnp.concatenate(
            [carry.angles[0], jnp.zeros(C, jnp.float32)]
        )
        (m_halo, m_ids, side, m_slot, m_vr, m_rx, m_ry, m_rz,
         m_ang) = jax.lax.sort(
            (m_halo, m_ids, side, m_slot, m_vr, m_rx, m_ry, m_rz, m_ang),
            num_keys=3,
        )

        is_cur = side == 1
        left_same = (
            (jnp.roll(m_halo, 1) == m_halo)
            & (jnp.roll(m_ids, 1) == m_ids)
            & (jnp.roll(side, 1) == 0)
        )
        first = jnp.arange(2 * C) == 0
        m_valid = (m_ids != _INVALID) & (m_halo < H)
        matched = is_cur & left_same & m_valid & ~first

        vr_l = jnp.roll(m_vr, 1)
        cos = jnp.clip(
            jnp.roll(m_rx, 1) * m_rx
            + jnp.roll(m_ry, 1) * m_ry
            + jnp.roll(m_rz, 1) * m_rz,
            -1.0, 1.0,
        )
        dtheta = jnp.where(matched, jnp.arccos(cos), 0.0)
        if pericentric:
            flip = (vr_l < 0) & (m_vr > 0)
        else:
            flip = (vr_l > 0) & (m_vr < 0)
        apsis = matched & flip
        angle_acc = jnp.roll(m_ang, 1) + dtheta
        apsis_angle = jnp.where(apsis, angle_acc, 0.0)
        angle_new = jnp.where(
            apsis | ~matched, 0.0, angle_acc
        )

        # ---- new carry: compact the cur side back out (stable sort by
        # ~is_cur keeps (halo, id) order within the kept half) ----
        (_, c_halo, c_ids, c_slot, c_vr, c_rx, c_ry, c_rz,
         c_ang) = jax.lax.sort(
            ((~is_cur).astype(jnp.int32), m_halo, m_ids, m_slot, m_vr,
             m_rx, m_ry, m_rz, angle_new),
            num_keys=1,
            is_stable=True,
        )
        new_carry = HashCarry(
            halo=c_halo[None, :C],
            ids=c_ids[None, :C],
            slot=c_slot[None, :C],
            vrad=c_vr[None, :C],
            rhat=jnp.stack(
                [c_rx[:C], c_ry[:C], c_rz[:C]], axis=-1
            )[None],
            angles=c_ang[None, :C],
        )

        # ---- events: prev-partner slot rides one position left ----
        ev_slot_src = jnp.roll(m_slot, 1)
        count = jnp.sum(apsis, dtype=jnp.int32)
        (_, e_halo, e_ids, e_slot, e_ang) = jax.lax.sort(
            ((~apsis).astype(jnp.int32), m_halo, m_ids,
             ev_slot_src, apsis_angle),
            num_keys=1,
            is_stable=True,
        )
        events = HashEvents(
            count=count[None],
            halo=e_halo[None, :K],
            ids=e_ids[None, :K],
            slots=e_slot[None, :K],
            angles=e_ang[None, :K].astype(angle_dtype),
            bulk_vel=bulk,
        )
        return new_carry, events

    return local_step


def make_hash_sharded_step(
    mesh: Mesh,
    n_halos: int,
    event_capacity: int,
    axis: str = "shards",
    mode: str = "pericentric",
    box_size=None,
    angle_dtype=jnp.float32,
):
    """Build ``step(carry, batch, centers, bulk_vels, hubble_drag) ->
    (carry, (ev_count, ev_halo, ev_ids, ev_slot, ev_angles, bulk))``.

    ``centers``: [H, 3] replicated; ``bulk_vels``: [H, 3] catalog bulk
    velocities or None (then the mass-weighted mean over each halo's
    particles is psum-reduced across shards, reference semantics
    ``track_orbits.py:267-284``).  Events come back per shard,
    ``[D, K]``, with exact per-shard counts.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh needs a {axis!r} axis")
    local_step = _make_local_step(
        n_halos, event_capacity, mode == "pericentric", box_size,
        angle_dtype, axis,
    )

    def step(carry, batch, centers, bulk_cat=None, hubble_drag=0.0):
        spec_dc = P(axis)
        in_specs = (
            jax.tree.map(lambda _: spec_dc, carry),
            jax.tree.map(lambda _: spec_dc, batch),
            P(),  # centers replicated
            None if bulk_cat is None else P(),
            P(),
        )
        out_specs = (
            jax.tree.map(lambda _: spec_dc, carry),
            HashEvents(
                count=spec_dc, halo=spec_dc, ids=spec_dc,
                slots=spec_dc, angles=spec_dc, bulk_vel=P(),
            ),
        )
        if bulk_cat is None:
            f = shard_map(
                lambda c, b, ce, hd: local_step(c, b, ce, None, hd),
                mesh=mesh,
                in_specs=(in_specs[0], in_specs[1], P(), P()),
                out_specs=out_specs,
                **_SHARD_MAP_KW,
            )
            return f(carry, batch, centers,
                     jnp.asarray(hubble_drag, jnp.float32))
        f = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(in_specs[0], in_specs[1], P(), P(), P()),
            out_specs=out_specs,
            **_SHARD_MAP_KW,
        )
        return f(carry, batch, centers, bulk_cat,
                 jnp.asarray(hubble_drag, jnp.float32))

    return step


class FlatRecords(NamedTuple):
    """Unrouted records sharded by *position*, [D, L] row blocks in load
    order (device d holds global slots ``[d*L, (d+1)*L)``).  This is the
    natural layout of data that is already device-resident — an
    integrator's particle blocks, or a snapshot stack staged in HBM —
    before ownership routing."""

    halo: jnp.ndarray   # [D, L] int32
    ids: jnp.ndarray    # [D, L] int32 (_INVALID = padding)
    slot: jnp.ndarray   # [D, L] int32 global load slot
    pos: jnp.ndarray    # [D, L, 3] f32
    vel: jnp.ndarray    # [D, L, 3] f32
    mass: Optional[jnp.ndarray]  # [D, L] f32 or None


def flat_to_position_shards(
    flat: dict, n_shards: int, pad_to: Optional[int] = None
) -> FlatRecords:
    """Host-side: chunk a flat load-order record list into the
    position-sharded ``[D, L]`` layout consumed by the device router.
    Consecutive chunks preserve load order, so the routed per-shard
    blocks come out in the exact order :func:`route_flat` produces."""
    ids = np.asarray(flat["ids"], dtype=np.int64)
    if ids.size and (ids.min() < 0 or ids.max() >= 2**31 - 1):
        raise ValueError(
            "hash-sharded tracking stores particle IDs as int32; remap "
            "IDs into [0, 2^31-1) in the loader"
        )
    n = len(ids)
    D = int(n_shards)
    L = int(pad_to) if pad_to is not None else -(-n // D) if n else 1
    if D * L < n:
        raise ValueError(f"pad_to={L} too small: {D}x{L} < {n} records")
    slot = np.asarray(
        flat.get("slot", np.arange(n, dtype=np.int64)), dtype=np.int64
    )
    mass = flat.get("mass")

    def pad(v, fill, dtype):
        v = np.asarray(v, dtype=dtype)
        out = np.full((D * L,) + v.shape[1:], fill, dtype)
        out[:n] = v
        return jnp.asarray(out.reshape((D, L) + v.shape[1:]))

    return FlatRecords(
        halo=pad(flat["halo"], 0, np.int32),
        ids=pad(ids, _INVALID, np.int32),
        slot=pad(slot, 0, np.int32),
        pos=pad(flat["pos"], 0, np.float32),
        vel=pad(flat["vel"], 0, np.float32),
        mass=None if mass is None else pad(mass, 1, np.float32),
    )


def _make_local_route(n_shards: int, cap: int, block: int, axis: str):
    """Device-side ownership routing (runs inside ``shard_map``): each
    device buckets its [1, L] load-order chunk by ``id % D`` into
    fixed-``block`` send buffers, one ``all_to_all`` exchanges them over
    ICI, and the receive side compacts its ``[D, block]`` blocks into
    the [1, cap] :class:`HashBatch` row — the device-resident equivalent
    of :func:`route_flat` (same within-shard record order, since source
    chunks are consecutive in load order).

    Returns ``local_route(FlatRecords row) -> (HashBatch row, dropped)``
    where ``dropped`` counts records lost to ``block``/``cap`` overflow
    on this device (fail-loud: the caller asserts zero; hash imbalance
    is O(sqrt), so a few % headroom suffices)."""
    D = int(n_shards)
    if D * block < cap:
        raise ValueError(
            f"block={block} too small: D*block={D * block} cannot fill "
            f"cap={cap}"
        )

    def local_route(flat):
        ids = flat.ids[0]
        L = ids.shape[0]
        valid = ids != _INVALID
        dst = jnp.where(valid, ids % D, D).astype(jnp.int32)
        perm = jnp.argsort(dst)  # stable: load order within buckets
        dst_s = dst[perm]
        counts = jnp.bincount(dst, length=D + 1)
        starts = jnp.concatenate(
            [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]]
        )
        rank = (
            jnp.arange(L, dtype=jnp.int32)
            - starts[dst_s].astype(jnp.int32)
        )
        ok = (rank < block) & (dst_s < D)
        bucket = jnp.where(ok, dst_s * block + rank, D * block)
        dropped_send = jnp.sum(
            (rank >= block) & (dst_s < D), dtype=jnp.int32
        )

        def exchange(v, fill):
            vs = v[perm]
            buf = jnp.full(
                (D * block,) + vs.shape[1:], fill, vs.dtype
            ).at[bucket].set(vs, mode="drop")
            return jax.lax.all_to_all(
                buf.reshape((D, block) + vs.shape[1:]),
                axis, split_axis=0, concat_axis=0, tiled=True,
            ).reshape((D * block,) + vs.shape[1:])

        r_ids = exchange(ids, _INVALID)
        valid_r = r_ids != _INVALID
        # stable: valid first, (source shard, in-bucket rank) order ==
        # global load order restricted to this shard
        perm2 = jnp.argsort(~valid_r)[:cap]
        n_valid = jnp.sum(valid_r, dtype=jnp.int32)
        dropped_recv = jnp.maximum(n_valid - cap, 0)

        batch = HashBatch(
            halo=exchange(flat.halo[0], 0)[perm2][None],
            ids=r_ids[perm2][None],
            slot=exchange(flat.slot[0], 0)[perm2][None],
            pos=exchange(flat.pos[0], 0.0)[perm2][None],
            vel=exchange(flat.vel[0], 0.0)[perm2][None],
            mass=(
                None if flat.mass is None
                else exchange(flat.mass[0], 1.0)[perm2][None]
            ),
        )
        return batch, (dropped_send + dropped_recv)[None]

    return local_route


def make_device_router(
    mesh: Mesh,
    cap: int,
    block: Optional[int] = None,
    axis: str = "shards",
):
    """Jittable ownership router: ``route(FlatRecords [D, L]) ->
    (HashBatch [D, cap], dropped [D])``.  ``block`` is the per-(source,
    destination) bucket width (default: 2x the uniform-hash expectation,
    and at least ``cap / D`` so a full batch can be assembled)."""
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh needs a {axis!r} axis")
    D = int(mesh.shape[axis])

    def route(flat: FlatRecords):
        L = flat.ids.shape[1]
        blk = block if block is not None else max(
            -(-2 * L // D), -(-cap // D)
        )
        local = _make_local_route(D, cap, blk, axis)
        spec = jax.tree.map(lambda _: P(axis), flat)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(
                jax.tree.map(lambda _: P(axis), HashBatch(
                    halo=0, ids=0, slot=0, pos=0, vel=0,
                    mass=None if flat.mass is None else 0,
                )),
                P(axis),
            ),
            **_SHARD_MAP_KW,
        )(flat)

    return route


def make_hash_scan(
    mesh: Mesh,
    n_halos: int,
    event_capacity: int,
    cap: int,
    block: Optional[int] = None,
    axis: str = "shards",
    mode: str = "pericentric",
    box_size=None,
    angle_dtype=jnp.float32,
):
    """Scan-resident hash-sharded tracking: route + join + detect for a
    whole snapshot sequence in ONE jitted ``lax.scan``, no host in the
    loop — the multi-chip counterpart of
    :func:`orbitanalysis_tpu.engine.scan.scan_events_sorted` (reference
    walks snapshots on the host, ``track_orbits.py:104``).

    Returns ``scan(carry, flat_seq, centers_seq, bulk_seq=None,
    hubble_drag=0.0) -> (carry, HashEvents [S, D, ...], dropped [S, D])``
    where ``flat_seq`` is a :class:`FlatRecords` with leaves ``[S, D, L]``
    (position-sharded load-order chunks per snapshot), ``centers_seq``
    is ``[S, H, 3]``, ``bulk_seq`` optionally ``[S, H, 3]``, and
    ``hubble_drag`` a scalar or ``[S]``.  Each step's ownership routing
    is a device-side ``all_to_all`` (see :func:`make_device_router`);
    ``dropped`` must come back all-zero (bucket overflow is fail-loud).
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh needs a {axis!r} axis")
    D = int(mesh.shape[axis])
    H = int(n_halos)
    local_step = _make_local_step(
        n_halos, event_capacity, mode == "pericentric", box_size,
        angle_dtype, axis,
    )

    def scan(carry, flat_seq, centers_seq, bulk_seq=None, hubble_drag=0.0):
        S, _, L = flat_seq.ids.shape
        blk = block if block is not None else max(
            -(-2 * L // D), -(-cap // D)
        )
        local_route = _make_local_route(D, cap, blk, axis)
        drag = jnp.broadcast_to(
            jnp.asarray(hubble_drag, jnp.float32), (S,)
        )
        centers_seq = jnp.asarray(centers_seq, jnp.float32)

        def mapped(carry, flats, centers_s, bulks, drags):
            def body(c, x):
                fl, ce, bu, dr = x
                batch, dropped = local_route(fl)
                c2, ev = local_step(c, batch, ce, bu, dr)
                return c2, (ev, dropped)

            return jax.lax.scan(
                body, carry, (flats, centers_s, bulks, drags)
            )

        spec_c = jax.tree.map(lambda _: P(axis), carry)
        spec_f = jax.tree.map(lambda _: P(None, axis), flat_seq)
        ev_spec = HashEvents(
            count=P(None, axis), halo=P(None, axis), ids=P(None, axis),
            slots=P(None, axis), angles=P(None, axis), bulk_vel=P(),
        )
        if bulk_seq is None:
            f = shard_map(
                lambda c, fl, ce, dr: mapped(c, fl, ce, None, dr),
                mesh=mesh,
                in_specs=(spec_c, spec_f, P(), P()),
                out_specs=(spec_c, (ev_spec, P(None, axis))),
                **_SHARD_MAP_KW,
            )
            carry, (events, dropped) = f(carry, flat_seq, centers_seq,
                                         drag)
        else:
            f = shard_map(
                mapped,
                mesh=mesh,
                in_specs=(spec_c, spec_f, P(), P(), P()),
                out_specs=(spec_c, (ev_spec, P(None, axis))),
                **_SHARD_MAP_KW,
            )
            carry, (events, dropped) = f(
                carry, flat_seq, centers_seq,
                jnp.asarray(bulk_seq, jnp.float32), drag,
            )
        return carry, events, dropped

    return scan


def events_to_reference_order(ev_count, ev_halo, ev_ids, ev_slot,
                              ev_angles, n_halos: int):
    """Host-side: merge per-shard event lists into the reference's
    per-halo, prev-load-order layout (offsets + flat ids/angles)."""
    ev_count = np.asarray(ev_count)
    parts = []
    for d in range(len(ev_count)):
        k = int(ev_count[d])
        parts.append((
            np.asarray(ev_halo[d][:k]),
            np.asarray(ev_ids[d][:k]),
            np.asarray(ev_slot[d][:k]),
            np.asarray(ev_angles[d][:k]),
        ))
    halo = np.concatenate([p[0] for p in parts])
    ids = np.concatenate([p[1] for p in parts])
    slot = np.concatenate([p[2] for p in parts])
    ang = np.concatenate([p[3] for p in parts])
    order = np.lexsort((slot, halo))
    halo, ids, slot, ang = halo[order], ids[order], slot[order], ang[order]
    counts = np.bincount(halo, minlength=n_halos)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return offsets, ids, ang
