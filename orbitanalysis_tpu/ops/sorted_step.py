"""Sorted-carry variant of the fused per-snapshot orbit step.

Same semantics as :func:`orbitanalysis_tpu.ops.apsis.make_orbit_step`
with event compaction (the reference's ``compare_radial_velocities`` +
``calc_angles`` chain, ``/root/reference/orbitanalysis/track_orbits.py:
293-351``), but the carried per-particle state is kept **sorted by
particle ID** between steps instead of in snapshot load order.

Why (measured on v5e): the general step's cost is three ``lax.sort``
networks per snapshot —

  1. merge sort of ``concat(prev, cur)`` by ID   (the join),
  2. restore sort back to slot order             (layout restoration),
  3. event-compaction sort                        (front-pack apsides).

With the carry stored in ID order, sorts 2 and 3 collapse into one:
after the merge, a single sort keyed by

  ``cur entry -> 0`` (stable: preserves ID order = the next carry),
  ``prev entry at an apsis -> 1 + load_slot`` (events, reference order),
  ``anything else -> BIG``

produces the next carry in positions ``[:P]`` and the compacted event
list — already in previous-snapshot load order, the reference's
within-halo output order (``track_orbits.py:199-217``) — in positions
``[P:P+K]``.  One 2P sort replaces a 2P sort plus a P sort.

Keeping the carry ID-sorted also makes the *prev* half of the join
presorted, which unlocks replacing the merge sort (1) with a true
bitonic **merge** — ``log2(2P)`` compare-exchange stages instead of a
full ``O(log^2)`` sort network — implemented as a VMEM-resident Pallas
kernel in :mod:`orbitanalysis_tpu.ops.pallas_merge` (``merge_impl=
"pallas"``; the current snapshot's side is first sorted by a plain
P-length ``lax.sort``, which is both shorter and carries fewer
channels than the 2P concat sort it replaces).

The compact event outputs are **identical** (same IDs, same order, same
angles) to the general step's ``ev_*`` outputs; only the carry layout
differs.  Load-order bookkeeping survives in the carry's ``slot``
channel, so checkpointing per-particle angles in reference layout stays
possible (``track_orbits.py:390-394``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbitanalysis_tpu.ops.geometry import region_frame
from orbitanalysis_tpu.utils.padding import invalid_id_for

#: Largest per-row capacity the fused kernel fits in VMEM (the whole
#: 2P merged row stays on-chip).  P=131072 compiles and matches the
#: lax_sort reference on v5e since the unmerge redesign freed the
#: former compaction buffers; P=262144 exceeds practical Mosaic
#: compile times (>9 min) and is untested.
MAX_FUSED_CAPACITY = 131072

#: Capacity ceiling the tracker's ``join_impl='auto'`` accepts before
#: falling back to the general path: P=131072 compiles and is correct,
#: but its ~10-minute Mosaic compile is opt-in (explicit
#: ``join_impl='sorted'``), not something 'auto' should spring on a run.
AUTO_FUSED_CAPACITY = 65536

#: Per-row ceiling of the ALIGNED engine's default (detect_impl='xla')
#: path: detection is plain elementwise XLA — no merged row, no
#: VMEM-resident 10-stream kernel — and only the event compaction
#: enters Pallas (2-3 u32 streams per row; ~8 MB VMEM at this width).
#: Rows past the single-word positional-payload budget route through
#: compact_payload_pair automatically.  This is the big-halo x wide-ID
#: exit: a halo outgrowing MAX_FUSED_CAPACITY keeps tracking on the
#: aligned engine instead of demanding a general-engine conversion
#: (which 64-bit surrogate IDs cannot take without x64).
MAX_ALIGNED_CAPACITY = 1 << 19

#: key_B value for merged entries that are neither part of the next
#: carry nor an apsis event (departed / padding / matched-away prev).
_DEAD_KEY = 1 << 30  # python int: a jnp scalar here would
#   initialize the XLA backend at import (breaks jax.distributed)


class SortedCarry(NamedTuple):
    """Per-particle state carried across snapshots, sorted by ID.

    ``ids`` is ascending within each halo row with the dtype-max padding
    sentinel last; ``slot`` records each particle's load-order slot in
    the snapshot it arrived with (for reference-layout reconstruction).
    ``vrb`` stores the radial-velocity sign as 2 bits (bit0: v_r < 0,
    bit1: v_r > 0) — detection only ever uses the sign
    (``track_orbits.py:311-314``), so the full value never rides a sort.
    """

    ids: jnp.ndarray     # [H, P] sorted ascending, sentinel-padded
    slot: jnp.ndarray    # [H, P] int32 load-order slot
    vrb: jnp.ndarray     # [H, P] uint8 v_r sign bits
    rhat: jnp.ndarray    # [3, H, P] radial unit vectors (SoA)
    angles: jnp.ndarray  # [H, P] cumulative angle since last apsis/entry


class CompactEvents(NamedTuple):
    """Per-step compact apsis events, previous-snapshot load order
    (or ID order with the load slots alongside — ``events_id_order``)."""

    count: jnp.ndarray     # [H] int32 apsides per halo (exact, may be > K)
    ids: jnp.ndarray       # [H, K] event particle IDs
    angles: jnp.ndarray    # [H, K] angle at each apsis
    bulk_vel: jnp.ndarray  # [H, 3] region bulk velocity of this snapshot
    slots: jnp.ndarray | None = None  # [H, K] prev load slots (id order)
    #: full pre-compaction event plane (aligned xla step with
    #: ``emit_payload=True`` only): ``[H, P]`` uint32 angle words
    #: ``f32_bits(angle) | (apsis << 31)`` (position = column index) —
    #: or the ``(posw, ang15)`` pair past PAYLOAD_MAX_ROW.  Lets the
    #: host recover EVERY event exactly when ``count > K`` truncated
    #: the compacted lists (the tracker's event-capacity growth path),
    #: with no step re-run; decode angles as the f32 bits cast to f16
    #: (RNE — identical bits to the kernel's in-VMEM encode).
    payload: jnp.ndarray | tuple | None = None


def init_sorted_carry(
    n_halos: int,
    capacity: int,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    pos_dtype=jnp.float32,
) -> SortedCarry:
    """All-invalid carry: every halo behaves as 'no progenitor yet'."""
    invalid = invalid_id_for(id_dtype)
    return SortedCarry(
        ids=jnp.full((n_halos, capacity), invalid, dtype=id_dtype),
        slot=jnp.broadcast_to(
            jnp.arange(capacity, dtype=jnp.int32), (n_halos, capacity)
        ),
        vrb=jnp.zeros((n_halos, capacity), dtype=jnp.uint8),
        rhat=jnp.zeros((3, n_halos, capacity), dtype=pos_dtype),
        angles=jnp.zeros((n_halos, capacity), dtype=angle_dtype),
    )


def presort_snapshot(batch, soa: bool = False):
    """Stage a :class:`SnapshotBatch` in ID-sorted row layout (host-side).

    Sorts each halo row ascending by particle ID (padding sentinels
    last, they are the dtype max) and records the original load-order
    slots in ``batch.slot``, for ``make_sorted_orbit_step(...,
    cur_presorted=True)``.  Accepts ``[H, P]`` or stacked ``[S, H, P]``
    batches; runs in NumPy at staging time (the point is to move the
    per-snapshot sort out of the device step and into the host
    pipeline, which overlaps with device compute in the tracker).

    ``soa=True`` additionally stages ``pos``/``vel`` in structure-of-
    arrays ``[3, H, P]`` (stacked: ``[S, 3, H, P]``) layout for
    ``make_sorted_orbit_step(..., soa_batch=True)`` — the AoS->SoA
    transpose the step would otherwise pay per snapshot happens once
    here instead.
    """
    import numpy as np

    ids = np.asarray(batch.ids)
    order = np.argsort(ids, axis=-1, kind="stable").astype(np.int32)

    def take(x):
        return np.take_along_axis(np.asarray(x), order, axis=-1)

    def take3(x):
        out = np.take_along_axis(np.asarray(x), order[..., None], axis=-2)
        if soa:
            out = np.moveaxis(out, -1, out.ndim - 3)
        return out

    slot = order if batch.slot is None else take(batch.slot)
    return batch._replace(
        ids=take(ids),
        pos=take3(batch.pos),
        vel=take3(batch.vel),
        mass=None if batch.mass is None else take(batch.mass),
        slot=slot,
    )


def _vr_bits(vr: jnp.ndarray) -> jnp.ndarray:
    return (vr < 0).astype(jnp.uint8) | ((vr > 0).astype(jnp.uint8) << 1)


def _shift_right(x, fill):
    """Value at the left neighbor (index i-1) along the last axis."""
    return jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)


def _shift_left(x, fill):
    """Value at the right neighbor (index i+1) along the last axis."""
    return jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)


def _decode_packed_angles(packed):
    """Split the compacted carry channel — the single bit-layout contract
    shared by the fused kernel and the compaction path: f32 angle in
    bits 0-30 (angles are non-negative, the sign bit is free), matched
    flag in bit 31."""
    match = (packed >> 31).astype(jnp.uint8)
    ang = jax.lax.bitcast_convert_type(
        packed & jnp.uint32(0x7FFFFFFF), jnp.float32
    )
    return match, ang


def _carry_from_channels(key_asc, sv_asc, rx, ry, rz, angles, match, id_dt):
    """Assemble the next SortedCarry from ID-ascending channels (packed
    key ``id << 1 | side``; sv = ``slot | vrb << 24``)."""
    return SortedCarry(
        ids=(key_asc >> 1).astype(id_dt),
        slot=sv_asc & 0x00FFFFFF,
        vrb=(sv_asc >> 24).astype(jnp.uint8) | (match << 2),
        rhat=jnp.stack([rx, ry, rz]),
        angles=angles,
    )


def _finish_events(count, ev_ids, ev_slot, ev_ang, K, invalid, id_dt,
                   angle_dtype, id_order):
    """Mask compacted event channels past each row's count, then either
    keep ID order (slots alongside, host restores reference order) or
    slot-sort on device.  Returns ``(ids, angles, slots_or_None)``."""
    h, k128 = ev_ids.shape
    kiota = jax.lax.broadcasted_iota(jnp.int32, (h, k128), 1)
    ev_ok = kiota < count[:, None]
    ids_raw = jnp.where(ev_ok, ev_ids, jnp.asarray(invalid, id_dt))
    ang_raw = jnp.where(ev_ok, ev_ang, jnp.asarray(0, angle_dtype))
    if id_order:
        return (
            ids_raw[:, :K],
            ang_raw[:, :K],
            jnp.where(ev_ok, ev_slot, -1)[:, :K],
        )
    _, ids_o, ang_o = jax.lax.sort(
        (jnp.where(ev_ok, ev_slot, jnp.int32(_DEAD_KEY)), ids_raw, ang_raw),
        dimension=-1,
        num_keys=1,
    )
    return ids_o[:, :K], ang_o[:, :K], None


def make_sorted_orbit_step(
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    merge_impl: str = "lax_sort",
    compact_impl: str = "lax_sort",
    cur_presorted: bool = False,
    fused: bool = False,
    events_id_order: bool = False,
    soa_batch: bool = False,
):
    """Build the sorted-carry per-snapshot step.

    Returns ``step(carry, snap) -> (carry, CompactEvents)`` — pure,
    static-shape, jit/scan/shard_map-ready.  ``snap`` is the same
    :class:`orbitanalysis_tpu.ops.apsis.SnapshotBatch` (load-order
    layout) the general step takes.

    ``merge_impl``: ``"lax_sort"`` merges prev+cur with one 2P variadic
    sort (prev sortedness unexploited); ``"pallas"`` pre-sorts the cur
    side (P-length sort) and merges with the VMEM-resident bitonic
    merge kernel.

    ``cur_presorted=True`` declares that each snapshot row arrives
    already ID-sorted ascending (padding sentinels last) — the staged
    layout produced by :func:`presort_snapshot` / a sorting loader —
    with the original load-order slots in ``snap.slot``.  The cur-side
    sort then disappears from the step entirely (with
    ``merge_impl="pallas"`` the join is just the bitonic merge); event
    output order still follows the original load order, so savefile
    parity with the reference is unaffected.

    On the ``fused`` path the event tensors are at most ``[H, P]`` wide
    (a row cannot produce more than P apsides): ``event_capacity > P``
    is clamped, so ``CompactEvents`` widths are ``min(K, P)`` there
    (the non-fused paths keep width ``K``).

    ``compact_impl``: ``"lax_sort"`` extracts the next carry + events
    with one 2P variadic sort; ``"pallas"`` uses the log-shift stream
    compaction kernel instead (plus a small ``[H, K]`` sort that puts
    events in reference order).  With ``merge_impl="pallas"`` the next
    carry is rebuilt from the cur-side sort directly and only the
    angle/match channels cross the merged domain.  On event-capacity
    overflow (``count > K``) the two impls may keep a different subset
    of the row's events — callers must treat overflowing rows as
    invalid either way.
    """
    if mode not in ("pericentric", "apocentric"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    if merge_impl not in ("lax_sort", "pallas"):
        raise ValueError(f"unknown merge_impl: {merge_impl!r}")
    if compact_impl not in ("lax_sort", "pallas"):
        raise ValueError(f"unknown compact_impl: {compact_impl!r}")
    if fused:
        # single-kernel path subsumes both pallas impls
        merge_impl = compact_impl = "pallas"
    if events_id_order and not fused:
        raise ValueError("events_id_order requires fused=True")
    if compact_impl == "pallas" and jnp.dtype(angle_dtype) != jnp.float32:
        raise ValueError(
            "compact_impl='pallas' packs the match bit into the f32 "
            "angle sign bit; use angle_dtype=float32"
        )
    if compact_impl == "pallas" and jnp.dtype(id_dtype).itemsize != 4:
        raise ValueError(
            "compact_impl='pallas' requires 32-bit particle IDs"
        )
    pericentric = mode == "pericentric"
    invalid = invalid_id_for(id_dtype)
    id_dt = jnp.dtype(id_dtype)
    # Single-key packing (id << 1 | side) requires ids < 2^31; guaranteed
    # for signed <=32-bit ids (sentinel is the dtype max).  See
    # ops/join.py for the aliasing argument.
    pack_key = (
        id_dt.itemsize * 8 <= 32 and jnp.issubdtype(id_dt, jnp.signedinteger)
    )
    if merge_impl == "pallas" and not pack_key:
        raise ValueError(
            "merge_impl='pallas' requires <=32-bit signed particle IDs "
            "(single packed uint32 sort key); use merge_impl='lax_sort'"
        )
    K = int(event_capacity)

    def step(carry: SortedCarry, snap):
        h, p = snap.ids.shape
        valid_cur = snap.ids != invalid

        frame = region_frame(
            snap.pos,
            snap.vel,
            valid_cur,
            snap.center,
            mass=snap.mass,
            bulk_vel=snap.bulk_vel,
            box_size=box_size,
            hubble_drag=snap.hubble_drag,
            soa=soa_batch,
        )

        iota = jax.lax.broadcasted_iota(jnp.int32, (h, p), 1)
        cur_vrb = _vr_bits(frame.vrad)
        cur_slot = iota if snap.slot is None else snap.slot

        # slot and the 3 v_r sign/match bits share one i32 sort channel
        # (slot < 2^24; channel count is the sort-cost driver)
        prev_sv = carry.slot | (carry.vrb.astype(jnp.int32) << 24)
        cur_sv = cur_slot | (cur_vrb.astype(jnp.int32) << 24)

        def cat(a, b):
            return jnp.concatenate([a, b], axis=1)

        if merge_impl == "pallas":
            from orbitanalysis_tpu.ops.pallas_merge import (
                merge_rows,
                sort_descending_u32,
            )

            # sort the cur side alone (P-length; the prev side is already
            # sorted in the carry), then bitonic-merge the halves in VMEM.
            # The cur half must be *descending* so the concatenation is
            # bitonic: free via a complemented sort key, or a flip when
            # the staged rows are already ascending (cur_presorted).
            cur_key = (snap.ids.astype(jnp.uint32) << 1) | 1
            prev_key = carry.ids.astype(jnp.uint32) << 1
            cur_asc = (cur_key, cur_sv, frame.rhat[0], frame.rhat[1],
                       frame.rhat[2])
            if cur_presorted:
                cur_ops = None if fused else tuple(
                    jnp.flip(x, axis=1) for x in cur_asc
                )
            else:
                cur_ops = sort_descending_u32(*cur_asc)

            if fused:
                from orbitanalysis_tpu.ops.pallas_step import (
                    fused_join_detect,
                    fused_static_detect,
                )

                prev_ops6 = (prev_key, prev_sv, carry.rhat[0],
                             carry.rhat[1], carry.rhat[2], carry.angles)
                k_eff = min(K, p)  # events <= P; keeps branch widths equal
                if cur_presorted:
                    # static-membership fast path: identical ID layout to
                    # the carry means matched pairs are already aligned —
                    # skip the merge and the carry compaction entirely
                    # (the integrator/scan regime, and slow-churn offline
                    # tracking).  The flip staging only runs in the
                    # general branch.
                    static_ok = jnp.all((prev_key | 1) == cur_key)

                    def _static(po, ca):
                        # aligned pairs -> detection is elementwise: run
                        # it in XLA (HBM copy speed) and keep only the
                        # sparse event compaction in a kernel (3 streams
                        # vs 10) — same split as the aligned engine's
                        # detect_impl='xla'; the Cephes _acos_f32 keeps
                        # angles bit-compatible with the kernel branch
                        from orbitanalysis_tpu.ops.pallas_compact import (
                            compact_events,
                        )
                        from orbitanalysis_tpu.ops.pallas_step import (
                            _acos_f32,
                        )

                        pk_, psv_, prx_, pry_, prz_, pang_ = po
                        ck_, csv_, crx_, cry_, crz_ = ca
                        valid = (ck_ >> 1) != jnp.uint32(invalid)
                        vrb_p = psv_ >> 24
                        vrb_c = csv_ >> 24
                        cosang = jnp.clip(
                            prx_ * crx_ + pry_ * cry_ + prz_ * crz_,
                            -1.0, 1.0,
                        )
                        dth = jnp.where(valid, _acos_f32(cosang), 0.0)
                        if pericentric:
                            flp = ((vrb_p & 1) > 0) & ((vrb_c & 2) > 0)
                        else:
                            flp = ((vrb_p & 2) > 0) & ((vrb_c & 1) > 0)
                        aps = valid & flp
                        acc = pang_ + dth
                        pck = jax.lax.bitcast_convert_type(
                            jnp.where(aps | ~valid, 0.0, acc), jnp.uint32
                        ) | (valid.astype(jnp.uint32) << 31)
                        evp_in = jax.lax.bitcast_convert_type(
                            jnp.where(aps, acc, 0.0), jnp.uint32
                        ) | (aps.astype(jnp.uint32) << 31)
                        cnt = jnp.sum(aps, axis=-1, dtype=jnp.int32)
                        ek, es, ep = compact_events(
                            evp_in, ck_, psv_, k_eff
                        )
                        ea = jax.lax.bitcast_convert_type(
                            ep & jnp.uint32(0x7FFFFFFF), jnp.float32
                        )
                        return pck, ek, es, ea, cnt

                    def _general(po, ca):
                        co = tuple(jnp.flip(x, axis=1) for x in ca)
                        pck, ek, es, ea, cnt = fused_join_detect(
                            po, co, pericentric, invalid, k_eff
                        )
                        # kernel's packed plane follows the staged
                        # (descending) cur order; one flip -> ascending
                        return jnp.flip(pck, axis=1), ek, es, ea, cnt

                    packed, evk, evsv, evang, count = jax.lax.cond(
                        static_ok, _static, _general, prev_ops6, cur_asc
                    )
                    asc = cur_asc
                else:
                    packed, evk, evsv, evang, count = fused_join_detect(
                        prev_ops6, cur_ops, pericentric, invalid, k_eff,
                    )
                    packed = jnp.flip(packed, axis=1)
                    asc = tuple(jnp.flip(x, axis=1) for x in cur_ops)
                match_o, ang_o = _decode_packed_angles(packed)
                new_carry = _carry_from_channels(
                    asc[0], asc[1], asc[2], asc[3], asc[4], ang_o,
                    match_o, id_dt,
                )
                ev_ids, ev_angles, ev_slots = _finish_events(
                    count, (evk >> 1).astype(id_dt), evsv & 0x00FFFFFF,
                    evang, K, invalid, id_dt, angle_dtype,
                    id_order=events_id_order,
                )
                return new_carry, CompactEvents(
                    count=count,
                    ids=ev_ids,
                    angles=ev_angles,
                    bulk_vel=frame.bulk_vel,
                    slots=ev_slots,
                )
            zeros_ang = jnp.zeros((h, p), angle_dtype)
            merged = merge_rows(
                (prev_key, prev_sv, carry.rhat[0], carry.rhat[1],
                 carry.rhat[2], carry.angles),
                cur_ops + (zeros_ang,),
            )
            k_s, sv_s, rx_s, ry_s, rz_s, ang_s = merged
            is_cur = (k_s & 1) == 1
            ids_s = (k_s >> 1).astype(id_dt)
        else:
            if pack_key:
                keys = cat(
                    carry.ids.astype(jnp.uint32) << 1,
                    (snap.ids.astype(jnp.uint32) << 1) | 1,
                )
                num_keys = 1
                head = (keys,)
            else:
                keys = cat(carry.ids, snap.ids)
                side = cat(
                    jnp.zeros((h, p), jnp.uint8), jnp.ones((h, p), jnp.uint8)
                )
                num_keys = 2
                head = (keys, side)
            sorted_ops = jax.lax.sort(
                head
                + (
                    cat(prev_sv, cur_sv),
                    cat(carry.rhat[0], frame.rhat[0]),
                    cat(carry.rhat[1], frame.rhat[1]),
                    cat(carry.rhat[2], frame.rhat[2]),
                    cat(carry.angles, jnp.zeros((h, p), angle_dtype)),
                ),
                dimension=-1,
                num_keys=num_keys,
            )
            if pack_key:
                k_s = sorted_ops[0]
                is_cur = (k_s & 1) == 1
                ids_s = (k_s >> 1).astype(id_dt)
                sv_s, rx_s, ry_s, rz_s, ang_s = sorted_ops[1:]
            else:
                ids_s, side_s = sorted_ops[0], sorted_ops[1]
                is_cur = side_s == 1
                sv_s, rx_s, ry_s, rz_s, ang_s = sorted_ops[2:]
        slot_s = sv_s & 0x00FFFFFF
        vrb_s = (sv_s >> 24).astype(jnp.uint8)

        # ---- detection in the merged domain (matched pairs adjacent,
        # prev first — exactly ops/apsis.py's compute()) ----
        valid_key = ids_s != invalid
        left_is_prev = ~_shift_right(is_cur, True)
        match_cur = (
            is_cur
            & left_is_prev
            & valid_key
            & (ids_s == _shift_right(ids_s, jnp.asarray(invalid, ids_s.dtype)))
        )
        vrb_l = _shift_right(vrb_s, jnp.uint8(0))
        rx_l = _shift_right(rx_s, 0.0)
        ry_l = _shift_right(ry_s, 0.0)
        rz_l = _shift_right(rz_s, 0.0)
        ang_l = _shift_right(ang_s, jnp.asarray(0, angle_dtype))

        cosang = jnp.clip(rx_l * rx_s + ry_l * ry_s + rz_l * rz_s, -1.0, 1.0)
        dtheta = jnp.where(match_cur, jnp.arccos(cosang), 0.0)
        if pericentric:
            flip = ((vrb_l & 1) > 0) & ((vrb_s & 2) > 0)
        else:
            flip = ((vrb_l & 2) > 0) & ((vrb_s & 1) > 0)
        apsis = match_cur & flip                      # at the cur position
        angle_acc = (ang_l + dtheta.astype(angle_dtype)).astype(angle_dtype)
        apsis_angle = jnp.where(apsis, angle_acc, 0).astype(angle_dtype)
        angle_new = jnp.where(
            apsis | ~match_cur, 0, angle_acc
        ).astype(angle_dtype)

        # route the event to its prev partner position (one slot left),
        # which holds the reference-layout slot number for event ordering
        apsis_prev = _shift_left(apsis, False)
        ev_angle_prev = _shift_left(apsis_angle, jnp.asarray(0, angle_dtype))
        count = jnp.sum(apsis, axis=-1, dtype=jnp.int32)

        if compact_impl == "pallas":
            from orbitanalysis_tpu.ops.pallas_compact import compact_rows

            # the match flag rides the angle's (always-clear) sign bit,
            # so the carry extraction is a single-channel compaction
            packed = jax.lax.bitcast_convert_type(angle_new, jnp.uint32) | (
                match_cur.astype(jnp.uint32) << 31
            )
            k128 = ((K + 127) // 128) * 128
            if merge_impl == "pallas":
                # next carry = the cur-side sort (ascending = flipped
                # descending); only packed angles cross the merged domain
                ops_a = (packed,)
            else:
                ops_a = (k_s, sv_s, rx_s, ry_s, rz_s, packed)
            a_out, (ev_id, ev_slot, ev_ang) = compact_rows(
                is_cur.astype(jnp.int32), ops_a, p,
                apsis_prev.astype(jnp.int32),
                (ids_s, slot_s, ev_angle_prev), k128,
            )
            match_o, ang_o = _decode_packed_angles(a_out[-1])
            if merge_impl == "pallas":
                if cur_presorted:
                    asc = cur_asc
                else:
                    asc = tuple(jnp.flip(x, axis=1) for x in cur_ops)
                carry_chans = asc[:5]
            else:
                carry_chans = a_out[:5]
            new_carry = _carry_from_channels(
                *carry_chans, ang_o, match_o, id_dt
            )
            # events arrive in merged (ID) order; a small [H, K] sort by
            # previous load slot restores the reference's output order
            ev_ids, ev_angles, _ = _finish_events(
                count, ev_id, ev_slot, ev_ang, K, invalid, id_dt,
                angle_dtype, id_order=False,
            )
        else:
            # ---- one sort: next carry to the front (stable keeps ID
            # order), events next (in prev load-slot order), dead last
            key_b = jnp.where(
                is_cur,
                jnp.int32(0),
                jnp.where(apsis_prev, jnp.int32(1) + slot_s, jnp.int32(_DEAD_KEY)),
            )
            angle_b = jnp.where(is_cur, angle_new, ev_angle_prev)
            # bit2 of vrb: this cur entry matched (entered = valid & ~bit2)
            sv_b = slot_s | (
                (vrb_s | (match_cur.astype(jnp.uint8) << 2)).astype(
                    jnp.int32
                )
                << 24
            )

            out = jax.lax.sort(
                (key_b, ids_s, sv_b, rx_s, ry_s, rz_s, angle_b),
                dimension=-1,
                num_keys=1,
            )
            _, ids_o, sv_o, rx_o, ry_o, rz_o, ang_o = out

            new_carry = SortedCarry(
                ids=ids_o[:, :p],
                slot=sv_o[:, :p] & 0x00FFFFFF,
                vrb=(sv_o[:, :p] >> 24).astype(jnp.uint8),
                rhat=jnp.stack([rx_o[:, :p], ry_o[:, :p], rz_o[:, :p]]),
                angles=ang_o[:, :p],
            )
            ev_ids = ids_o[:, p:p + K]
            ev_angles = ang_o[:, p:p + K]

        events = CompactEvents(
            count=count,
            ids=ev_ids,
            angles=ev_angles,
            bulk_vel=frame.bulk_vel,
        )
        return new_carry, events

    return step


class AlignedCarry(NamedTuple):
    """Carry of the carry-native aligned engine, stored in the detection
    kernel's own packed channel formats — so the step has **no XLA
    encode/decode around the kernel at all** (the former
    ``same``/``prev_sv`` select, ``_decode_packed_angles``, and
    ``_carry_from_channels`` read-modify-write passes over ``[H, P]``
    planes disappear; the kernel streams these planes verbatim).

    ``key``: ``(id << 1) | 1`` (the staged cur key of the last step);
    ``sv``: ``load_slot | FRESH?<<27 | vrb<<24`` (last step's staged
    ``csv``); ``rhat``: last snapshot's radial unit vectors;
    ``packed``: f32 angle accumulator in bits 0-30, match flag bit 31
    (the kernel's ``out_packed`` verbatim).
    """

    key: jnp.ndarray     # [H, P] uint32
    sv: jnp.ndarray      # [H, P] int32
    rhat: jnp.ndarray    # [3, H, P] float32
    packed: jnp.ndarray  # [H, P] uint32


def init_aligned_carry(n_halos: int, capacity: int,
                       pos_dtype=jnp.float32,
                       rhat_packed: bool = False) -> AlignedCarry:
    """All-invalid native carry (32-bit signed IDs; the int32-max
    sentinel's key is ``0xFFFFFFFF``).  ``rhat_packed=True`` stores the
    radial unit vectors octahedral-compressed (one uint32 plane instead
    of 3 f32: carry drops 24 -> 16 B/particle — the 1e8-per-chip
    memory diet; pair with ``make_aligned_native_step(...,
    rhat_packed=True)``).  Apsis counts are unaffected by construction:
    radial-velocity signs are recomputed from positions every step and
    never read the carried rhat, which feeds only the angle
    accumulator (~1e-4 rad quantization per step)."""
    invalid = invalid_id_for(jnp.int32)
    return AlignedCarry(
        key=jnp.full(
            (n_halos, capacity),
            (np.uint32(invalid) << np.uint32(1)) | np.uint32(1),
            dtype=jnp.uint32,
        ),
        sv=jnp.broadcast_to(
            jnp.arange(capacity, dtype=jnp.int32), (n_halos, capacity)
        ),
        rhat=(
            jnp.zeros((n_halos, capacity), dtype=jnp.uint32)
            if rhat_packed
            else jnp.zeros((3, n_halos, capacity), dtype=pos_dtype)
        ),
        packed=jnp.zeros((n_halos, capacity), dtype=jnp.uint32),
    )


def decode_aligned_carry(carry: AlignedCarry) -> SortedCarry:
    """Host-side NumPy unpack of the native carry into the
    :class:`SortedCarry` channel layout (ids / slot / vrb / angles) —
    for the rare host consumers: checkpointing, capacity growth,
    engine conversion."""
    key = np.asarray(carry.key)
    sv = np.asarray(carry.sv)
    packed = np.asarray(carry.packed)
    match = (packed >> 31).astype(np.uint8)
    return SortedCarry(
        ids=(key >> np.uint32(1)).astype(np.int32),
        slot=(sv & 0x00FFFFFF).astype(np.int32),
        vrb=((sv >> 24) & 3).astype(np.uint8) | (match << 2),
        rhat=np.asarray(carry.rhat),
        angles=(packed & np.uint32(0x7FFFFFFF)).view(np.float32),
    )


def encode_aligned_carry(c: SortedCarry) -> AlignedCarry:
    """Inverse of :func:`decode_aligned_carry` (host-side NumPy)."""
    ids = np.asarray(c.ids)
    vrb = np.asarray(c.vrb)
    angles = np.ascontiguousarray(c.angles, dtype=np.float32)
    return AlignedCarry(
        key=(ids.astype(np.uint32) << np.uint32(1)) | np.uint32(1),
        sv=(np.asarray(c.slot) & 0x00FFFFFF).astype(np.int32)
        | ((vrb & 3).astype(np.int32) << 24),
        rhat=np.asarray(c.rhat),
        packed=angles.view(np.uint32)
        | (((vrb >> 2) & 1).astype(np.uint32) << np.uint32(31)),
    )


def aligned_detect_math(carry: AlignedCarry, valid_cur, slot, frame,
                        pericentric: bool, invalid,
                        rhat_packed: bool = False,
                        share_angles: bool = False):
    """The aligned engine's XLA detect chain as one shared function —
    positional keys, FRESH gating, sign-flip detection, angle
    accumulation, packed-carry encode, and the u32 event payload
    plane.  Factored out so probe/ablation code times EXACTLY the
    shipping math (`benchmarks/aligned_ablation.py` hand-duplicated it
    through round 4 and had drifted to id-based keys — round-4
    advisor item 2).

    Returns ``(cur_key, cur_sv, apsis, angle_acc, packed, ang15,
    count, pos_iota)`` — everything
    :func:`make_aligned_native_step`'s xla branch needs around the
    compaction kernel.
    """
    from orbitanalysis_tpu.ops.pallas_label import f16_bits_rne
    from orbitanalysis_tpu.ops.pallas_step import _acos_f32
    from orbitanalysis_tpu.utils.numerics import oct_decode

    h, p = valid_cur.shape
    cur_vrb = _vr_bits(frame.vrad)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (h, p), 1)
    inv_key = (jnp.uint32(invalid) << 1) | 1
    cur_key = jnp.where(
        valid_cur, (pos_iota.astype(jnp.uint32) << 1) | 1, inv_key
    )
    cur_sv = slot | (cur_vrb.astype(jnp.int32) << 24)
    fresh = (slot & (1 << 27)) != 0
    vrb_p = carry.sv >> 24  # sign bits 0-1 (bit 3 = stale FRESH)
    pang = jax.lax.bitcast_convert_type(
        carry.packed & jnp.uint32(0x7FFFFFFF), jnp.float32
    )
    prev_rhat = oct_decode(carry.rhat) if rhat_packed else carry.rhat
    cosang = jnp.clip(
        prev_rhat[0] * frame.rhat[0]
        + prev_rhat[1] * frame.rhat[1]
        + prev_rhat[2] * frame.rhat[2],
        -1.0, 1.0,
    )
    dtheta = jnp.where(valid_cur, _acos_f32(cosang), 0.0)
    if pericentric:
        flip = ((vrb_p & 1) > 0) & ((cur_vrb & 2) > 0)
    else:
        flip = ((vrb_p & 2) > 0) & ((cur_vrb & 1) > 0)
    apsis = valid_cur & flip & ~fresh
    angle_acc = jnp.where(fresh, 0.0, pang + dtheta)
    if share_angles:
        # materialize the accumulated angles once: angle_acc feeds TWO
        # independent consumers (the packed carry and the payload's
        # f16 encode), and without the barrier XLA places them in
        # separate fusions that each recompute the full upstream
        # geometry + arccos chain — measured 5.9 ms/scan of duplicated
        # work at the bench shape (benchmarks/extract_decomp_probe.py
        # d+ang15 vs detect) versus one 8.4 MB plane round-trip
        apsis, angle_acc = jax.lax.optimization_barrier(
            (apsis, angle_acc))
    packed = jax.lax.bitcast_convert_type(
        jnp.where(apsis | ~valid_cur, 0.0, angle_acc),
        jnp.uint32,
    ) | ((valid_cur & ~fresh).astype(jnp.uint32) << 31)
    # integer RNE f32->f16 bits (pallas_label.f16_bits_rne,
    # bit-identical to astype(float16) for the non-negative finite
    # angles here): no [H, P] f16/u16 arrays means no 16-bit relayout
    # passes in the extract phase
    ang15 = f16_bits_rne(angle_acc)
    count = jnp.sum(apsis, axis=-1, dtype=jnp.int32)
    return (cur_key, cur_sv, apsis, angle_acc, packed, ang15, count,
            pos_iota)


def make_aligned_native_step(
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    events_id_order: bool = True,
    soa_batch: bool = False,
    detect_impl: str = "xla",
    rhat_packed: bool = False,
    emit_payload: bool = False,
):
    """Carry-native stable-layout step — the flagship tracking path.

    Semantically identical to :func:`make_aligned_orbit_step` (same
    staged-snapshot contract, same :class:`CompactEvents` outputs), but
    the carry is an :class:`AlignedCarry` held in the kernel's packed
    channel formats and the tenant-change (FRESH) flag is computed by
    the *host staging* (bit 27 of ``snap.slot``,
    :data:`orbitanalysis_tpu.engine.packing.FRESH_BIT`) instead of a
    device-side ID compare.  What that buys (measured round 2: the
    static kernel ran at its ~34 ms DMA floor at 67M particles while
    the full step took ~56 ms): every XLA read-modify-write pass over
    the ``[H, P]`` planes around the kernel disappears —

      - no ``same = snap.ids == carry.ids`` compare + ``prev_sv``
        select: the kernel streams ``carry.sv``/``carry.packed``
        verbatim and suppresses stale prev state from the staged FRESH
        bit in-kernel;
      - no ``_decode_packed_angles`` / ``_carry_from_channels``
        re-encode: the kernel's ``out_packed`` *is* the next carry's
        angle plane, and the staged ``cur_key``/``cur_sv`` are the next
        carry's key/sv planes;
      - no ``jnp.stack`` copy of the rhat planes: ``frame.rhat`` is
        stored as-is.

    The remaining per-step XLA work is ``region_frame`` (genuine
    geometry) plus the fused key/sv bit-packing of the staged inputs.

    ``detect_impl`` picks where the (elementwise) detection math runs:

    - ``'xla'`` (default): sign-flip detection, angle accumulation, and
      carry packing are plain XLA elementwise ops — they fuse into
      single passes streaming at HBM copy speed (~880 GB/s on v5e) —
      and only the sparse event extraction enters a Pallas kernel
      (:func:`orbitanalysis_tpu.ops.pallas_compact.compact_events`,
      THREE input streams).  On the aligned layout nothing else needs
      a kernel: there is no merge, so no cross-lane dependency.  The
      arccos is the same Cephes polynomial the kernels use
      (:func:`orbitanalysis_tpu.ops.pallas_step._acos_f32` is pure
      jnp), so angles match the kernel path to the last ulp on CPU and
      within 1 f32 ulp across backends.
    - ``'pallas'``: the 10-stream
      :func:`~orbitanalysis_tpu.ops.pallas_step.fused_static_detect`
      kernel (``native=True``) — detection and compaction in one
      ``pallas_call``, bounded by the measured ~225 GB/s per-kernel
      DMA ceiling.  Kept for A/B measurement and as the
      maximally-fused fallback.

    Requires snapshots staged by the stable-layout pipeline
    (``pack_snapshot_aligned`` / ``stage_batch_aligned``), whose
    ``slot`` channel carries the FRESH flags; ``snap.slot`` is
    mandatory here.  Replaces the reference's per-snapshot ``myin1d``
    join (``/root/reference/orbitanalysis/track_orbits.py:300-309``)
    with host-side integer bookkeeping exactly like
    :func:`make_aligned_orbit_step` — see there for the semantics
    citations.

    ``emit_payload=True`` (xla detect only) additionally returns the
    full pre-compaction event plane in ``CompactEvents.payload`` so a
    host consumer can recover every event exactly when a row's count
    exceeds ``event_capacity`` — the tracker's event-capacity growth
    path (the reference has no static event bound at all,
    ``track_orbits.py:199-217``; this keeps the bounded fast
    compaction without making overflow lossy).
    """
    if mode not in ("pericentric", "apocentric"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    if jnp.dtype(angle_dtype) != jnp.float32:
        raise ValueError(
            "the aligned engine packs the match bit into the f32 angle "
            "sign bit; use angle_dtype=float32"
        )
    id_dt = jnp.dtype(id_dtype)
    if id_dt.itemsize != 4 or not jnp.issubdtype(id_dt, jnp.signedinteger):
        raise ValueError(
            "the aligned engine requires 32-bit signed particle IDs "
            "(packed uint32 keys)"
        )
    if detect_impl not in ("xla", "pallas"):
        raise ValueError(f"unknown detect_impl: {detect_impl!r}")
    if rhat_packed and detect_impl != "xla":
        raise ValueError(
            "rhat_packed requires detect_impl='xla' (the fused pallas "
            "detect kernel streams f32 rhat planes)"
        )
    if emit_payload and detect_impl != "xla":
        raise ValueError(
            "emit_payload requires detect_impl='xla' (the pallas path "
            "has no pre-compaction payload plane to expose)"
        )
    from orbitanalysis_tpu.ops.pallas_step import fused_static_detect
    from orbitanalysis_tpu.utils.numerics import oct_encode

    pericentric = mode == "pericentric"
    invalid = invalid_id_for(id_dtype)
    K = int(event_capacity)

    def step(carry: AlignedCarry, snap):
        if snap.slot is None:
            raise ValueError(
                "the carry-native aligned step needs stable-layout "
                "staging: snap.slot (with FRESH flags in bit 27) is "
                "mandatory — stage via pack_snapshot_aligned / "
                "stage_batch_aligned"
            )
        h, p = snap.ids.shape
        valid_cur = snap.ids != invalid

        frame = region_frame(
            snap.pos,
            snap.vel,
            valid_cur,
            snap.center,
            mass=snap.mass,
            bulk_vel=snap.bulk_vel,
            box_size=box_size,
            hubble_drag=snap.hubble_drag,
            soa=soa_batch,
        )

        k_eff = min(K, p)
        if detect_impl == "xla":
            from orbitanalysis_tpu.ops.pallas_compact import (
                PAYLOAD_MAX_ROW,
                compact_angle_blocked,
                compact_payload_pair,
            )

            # positional keys: the stable layout makes detection (and
            # hence the event stream) purely positional — the key
            # channel carries the row position, never the particle ID,
            # and events come back as positions the host maps through
            # its staged tables (IDs, prev load slots).  The slot
            # channel already carries FRESH<<27 from staging; vrb
            # lands in bits 24-25 (slot proper is < 2^24).  Payload
            # word: ((pos + 1) << 15) | f16(angle) — angles are
            # non-negative so their f16 encoding needs only 15 bits
            # (the savefile stores f16 anyway), and the 17 bits above
            # hold pos + 1 <= 2**17 - 1; zero = no event.  See
            # aligned_detect_math for the full chain.
            (cur_key, cur_sv, apsis, angle_acc, packed, ang15, count,
             pos_iota) = aligned_detect_math(
                carry, valid_cur, snap.slot, frame, pericentric,
                invalid, rhat_packed=rhat_packed,
            )
            # At the 131072-row fused ceiling the LAST position's
            # pos + 1 = 2**17 would wrap the single payload word to
            # zero and drop the event, so such rows take the
            # two-stream pair kernel.
            if p <= PAYLOAD_MAX_ROW:
                # angle-word stream: f32 angle bits + apsis flag in
                # bit 31 (angles are non-negative).  The payload word
                # (f16 encode, iota, select) is built INSIDE the
                # compaction kernel — the XLA-side encode measured
                # ~5 ms/scan of half-fused [H, P] passes at the bench
                # shape (benchmarks/extract_decomp_probe.py)
                aw = jax.lax.bitcast_convert_type(
                    angle_acc, jnp.uint32
                ) | (apsis.astype(jnp.uint32) << 31)
                full_payload = aw if emit_payload else None
                evpay = compact_angle_blocked(aw, k_eff)
                ev_pos = (evpay >> 15).astype(jnp.int32) - 1
                ev_ang_bits = evpay & jnp.uint32(0x7FFF)
            else:
                posw = jnp.where(
                    apsis, (pos_iota + 1).astype(jnp.uint32), jnp.uint32(0)
                )
                full_payload = (posw, ang15) if emit_payload else None
                evposw, ev_ang_bits = compact_payload_pair(
                    posw, ang15, k_eff
                )
                ev_pos = evposw.astype(jnp.int32) - 1
            evang = jax.lax.bitcast_convert_type(
                ev_ang_bits.astype(jnp.uint16), jnp.float16,
            ).astype(angle_dtype)
            new_carry = AlignedCarry(
                key=cur_key, sv=cur_sv,
                rhat=(oct_encode(frame.rhat) if rhat_packed
                      else frame.rhat),
                packed=packed,
            )
            kw = ev_pos.shape[1]
            kiota = jax.lax.broadcasted_iota(jnp.int32, (h, kw), 1)
            ev_ok = kiota < count[:, None]
            return new_carry, CompactEvents(
                count=count,
                ids=jnp.where(ev_ok, ev_pos, jnp.int32(invalid))[:, :K],
                angles=jnp.where(ev_ok, evang, 0.0)[:, :K],
                bulk_vel=frame.bulk_vel,
                slots=None,
                payload=full_payload,
            )

        # pallas fallback path: same positional key/sv packing as
        # aligned_detect_math, detection + compaction inside the
        # 10-stream fused kernel
        cur_vrb = _vr_bits(frame.vrad)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (h, p), 1)
        inv_key = (jnp.uint32(invalid) << 1) | 1
        cur_key = jnp.where(
            valid_cur, (pos_iota.astype(jnp.uint32) << 1) | 1, inv_key
        )
        cur_sv = snap.slot | (cur_vrb.astype(jnp.int32) << 24)
        packed, evk, evsv, evang, count = fused_static_detect(
            (carry.key, carry.sv, carry.rhat[0], carry.rhat[1],
             carry.rhat[2], carry.packed),
            (cur_key, cur_sv, frame.rhat[0], frame.rhat[1],
             frame.rhat[2]),
            pericentric, invalid, k_eff, native=True,
        )
        new_carry = AlignedCarry(
            key=cur_key, sv=cur_sv, rhat=frame.rhat, packed=packed
        )
        ev_ids, ev_angles, ev_slots = _finish_events(
            count, (evk >> 1).astype(id_dt), evsv & 0x00FFFFFF,
            evang, K, invalid, id_dt, angle_dtype,
            id_order=events_id_order,
        )
        return new_carry, CompactEvents(
            count=count,
            ids=ev_ids,
            angles=ev_angles,
            bulk_vel=frame.bulk_vel,
            slots=ev_slots,
        )

    return step


def make_aligned_orbit_step(
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    events_id_order: bool = True,
    soa_batch: bool = False,
):
    """Stable-layout per-snapshot step: membership churn at static-path
    speed, with **no device-side join at all**.

    The insight over :func:`make_sorted_orbit_step`: the device never
    needed ID-*sorted* rows — it needs rows whose layout is *stable
    across snapshots*.  Since the host stages every snapshot anyway
    (the tracker is host-fed by construction), the staging pipeline can
    assign each particle a persistent position
    (:class:`orbitanalysis_tpu.engine.packing.StableLayout`: a matched
    particle keeps its position, an entrant reuses a departure's hole).
    Prev carry and staged cur are then aligned element-wise by
    construction and the whole merge/unmerge/compaction chain of the
    fused join kernel disappears — the step is
    :func:`~orbitanalysis_tpu.ops.pallas_step.fused_static_detect` plus
    a few streamed selects.  The O(N log N) work the reference's
    ``myin1d`` join does per snapshot
    (``/root/reference/orbitanalysis/track_orbits.py:300-309``) becomes
    integer bookkeeping on the host, overlapped with device compute by
    the tracker's prefetch thread.

    Positions whose tenant changed between snapshots (entrant, or a
    reused hole) ride the FRESH flag (bit 27 of the prev ``sv``
    channel): the kernel suppresses the stale prev state and restarts
    the angle accumulation at exactly 0 — an entrant starts from zero,
    the reference's semantics for newly tracked particles
    (``/root/reference/orbitanalysis/track_orbits.py:337-344``) — and
    zero prev sign bits mean no flip can fire on entry.

    ``snap`` must be staged in the stable layout (``snap.slot`` maps
    positions back to the row's load order, as produced by
    ``pack_snapshot_aligned``).  Events come back compacted with prev
    load slots (``events_id_order=True``: position order + slots, the
    host restores reference order by one [H, K] sort — identical
    contract to the fused sorted engine's).
    """
    if mode not in ("pericentric", "apocentric"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    if jnp.dtype(angle_dtype) != jnp.float32:
        raise ValueError(
            "the aligned engine packs the match bit into the f32 angle "
            "sign bit; use angle_dtype=float32"
        )
    id_dt = jnp.dtype(id_dtype)
    if id_dt.itemsize != 4 or not jnp.issubdtype(id_dt, jnp.signedinteger):
        raise ValueError(
            "the aligned engine requires 32-bit signed particle IDs "
            "(packed uint32 keys)"
        )
    from orbitanalysis_tpu.ops.pallas_step import fused_static_detect

    pericentric = mode == "pericentric"
    invalid = invalid_id_for(id_dtype)
    K = int(event_capacity)

    def step(carry: SortedCarry, snap):
        h, p = snap.ids.shape
        valid_cur = snap.ids != invalid

        frame = region_frame(
            snap.pos,
            snap.vel,
            valid_cur,
            snap.center,
            mass=snap.mass,
            bulk_vel=snap.bulk_vel,
            box_size=box_size,
            hubble_drag=snap.hubble_drag,
            soa=soa_batch,
        )

        iota = jax.lax.broadcasted_iota(jnp.int32, (h, p), 1)
        cur_vrb = _vr_bits(frame.vrad)
        cur_slot = iota if snap.slot is None else snap.slot
        cur_key = (snap.ids.astype(jnp.uint32) << 1) | 1
        cur_sv = cur_slot | (cur_vrb.astype(jnp.int32) << 24)

        # continuing tenant at this position <=> carry state applies;
        # otherwise the FRESH flag (bit 27) makes the kernel ignore the
        # stale prev streams — no rhat/angle selects needed
        same = snap.ids == carry.ids
        prev_sv = jnp.where(
            same,
            carry.slot | ((carry.vrb & 3).astype(jnp.int32) << 24),
            jnp.int32(1 << 27),
        )

        k_eff = min(K, p)
        packed, evk, evsv, evang, count = fused_static_detect(
            (carry.ids.astype(jnp.uint32) << 1, prev_sv,
             carry.rhat[0], carry.rhat[1], carry.rhat[2], carry.angles),
            (cur_key, cur_sv, frame.rhat[0], frame.rhat[1], frame.rhat[2]),
            pericentric, invalid, k_eff,
        )
        match_o, ang_o = _decode_packed_angles(packed)
        new_carry = _carry_from_channels(
            cur_key, cur_sv, frame.rhat[0], frame.rhat[1], frame.rhat[2],
            ang_o, match_o, id_dt,
        )
        ev_ids, ev_angles, ev_slots = _finish_events(
            count, (evk >> 1).astype(id_dt), evsv & 0x00FFFFFF,
            evang, K, invalid, id_dt, angle_dtype,
            id_order=events_id_order,
        )
        return new_carry, CompactEvents(
            count=count,
            ids=ev_ids,
            angles=ev_angles,
            bulk_vel=frame.bulk_vel,
            slots=ev_slots,
        )

    return step
