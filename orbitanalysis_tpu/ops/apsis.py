"""The fused per-snapshot orbit-tracking step.

This is the inner loop of the whole framework: one jit'd function that
fuses what the reference spreads across ``region_frame``,
``compare_radial_velocities`` and ``calc_angles``
(``/root/reference/orbitanalysis/track_orbits.py:247-351``) and runs it for
*all* halos at once on the padded ``[n_halos, capacity]`` state:

  pack -> periodic recenter -> bulk velocity -> radial velocity
  -> gather-free sort-merge ID join -> sign-flip apsis flag
  -> angle accumulate/reset

Carried state (the reference's ``*_prev`` arrays at
``track_orbits.py:234-240``) lives in HBM between steps; the host only
receives compact event tensors.  The step is pure and static-shape, so it
can be driven by a Python loop (host-fed snapshots), ``lax.scan``
(HBM-resident snapshots), or sharded over a device mesh along the halo
axis (the TPU-native replacement for the reference's per-halo process
pool, ``track_orbits.py:189-194``).

TPU performance design (measured on v5e): ``searchsorted`` /
``take_along_axis`` lower to binary-search loops and gathers that run
~100x slower than ``lax.sort``, so the ID cross-match and all payload
movement between the previous and current particle layouts go through
:func:`orbitanalysis_tpu.ops.join.merge_join` — two variadic sorts and
neighbor shifts, zero gathers.  Unit vectors are carried in
structure-of-arrays ``[3, H, P]`` layout so the minor axis fills the
128-wide lanes (a ``[..., 3]`` minor axis wastes 125/128 of each tile).

Semantics notes (kept deliberately identical to the reference):

- pericenter: ``v_r(prev) < 0 and v_r(now) > 0``; apocenter: the reverse
  (``track_orbits.py:311-314``) — evaluated only for ID-matched particles;
- the angular advance between snapshots is ``arccos(rhat_prev . rhat_now)``
  (``track_orbits.py:324-325``), accumulated per particle since its last
  apsis or region entry, recorded at an apsis and then reset to zero
  (``calc_angles``, ``track_orbits.py:330-351``);
- particles entering a region (or whose halo had no progenitor) start with
  angle 0 (``track_orbits.py:180-183``).

Deviations (documented improvements): angles are accumulated in float32
instead of float16 (``track_orbits.py:351``; float16 is applied only at the
output boundary — see SURVEY.md "Inconsistencies" #5), and the arccos
argument is clamped to [-1, 1] to avoid NaN from rounding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbitanalysis_tpu.ops.geometry import region_frame
from orbitanalysis_tpu.ops.join import merge_join
from orbitanalysis_tpu.utils.padding import invalid_id_for


class Carry(NamedTuple):
    """Per-particle state carried across the snapshot scan."""

    ids: jnp.ndarray     # [H, P] particle IDs, load order, sentinel-padded
    rhat: jnp.ndarray    # [3, H, P] radial unit vectors (SoA layout)
    vrad: jnp.ndarray    # [H, P]
    angles: jnp.ndarray  # [H, P] cumulative angle since last apsis/entry


class SnapshotBatch(NamedTuple):
    """One snapshot's padded device input."""

    ids: jnp.ndarray                    # [H, P]
    pos: jnp.ndarray                    # [H, P, 3]
    vel: jnp.ndarray                    # [H, P, 3]
    center: jnp.ndarray                 # [H, 3]
    mass: Optional[jnp.ndarray] = None      # [H, P] (None = equal masses)
    bulk_vel: Optional[jnp.ndarray] = None  # [H, 3] catalog bulk velocities
    hubble_drag: jnp.ndarray | float = 0.0  # scalar H(z)/(1+z); 0 = off
    # original load-order slot of each entry, for snapshots staged in a
    # permuted (e.g. ID-sorted) row layout; None = rows are in load order
    slot: Optional[jnp.ndarray] = None      # [H, P] int32


class StepEvents(NamedTuple):
    """Per-step outputs; prev-layout tensors align with the previous
    snapshot's slot order (= the reference's within-halo output order)."""

    apsis: jnp.ndarray        # [H, P] bool, prev layout
    apsis_angle: jnp.ndarray  # [H, P], prev layout: angle at the apsis
    dtheta: jnp.ndarray       # [H, P], prev layout: per-pair angle change
    matched_prev: jnp.ndarray  # [H, P] bool, prev layout
    departed: jnp.ndarray     # [H, P] bool, prev layout
    entered: jnp.ndarray      # [H, P] bool, cur layout
    radius: jnp.ndarray       # [H, P], cur layout
    bulk_vel: jnp.ndarray     # [H, 3]
    prev_slot: jnp.ndarray    # [H, P] int32, cur layout: prev slot of each
    #                           current particle, -1 = entered/padding
    # on-device event compaction (None unless event_capacity was set):
    # events gathered to the front of each row in slot order, so the host
    # fetches [H, K] instead of [H, P] — the fetch-bandwidth optimization
    ev_count: jnp.ndarray | None = None   # [H] int32 apsides per halo
    ev_ids: jnp.ndarray | None = None     # [H, K] event particle IDs
    ev_angles: jnp.ndarray | None = None  # [H, K] angle at each apsis


def init_carry(
    n_halos: int,
    capacity: int,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    pos_dtype=jnp.float32,
) -> Carry:
    """All-invalid carry: every halo behaves as 'no progenitor yet'."""
    invalid = invalid_id_for(id_dtype)
    return Carry(
        ids=jnp.full((n_halos, capacity), invalid, dtype=id_dtype),
        rhat=jnp.zeros((3, n_halos, capacity), dtype=pos_dtype),
        vrad=jnp.zeros((n_halos, capacity), dtype=pos_dtype),
        angles=jnp.zeros((n_halos, capacity), dtype=angle_dtype),
    )


def _compact_events(apsis, ids, apsis_angle, event_capacity):
    """On-device event compaction: sort apsis entries to the row front
    in load-slot order, returning ``(count, ids[:, :K], angles[:, :K])``
    (all ``None`` when ``event_capacity`` is) — hosts fetch these fixed
    ``[H, K]`` lists instead of full masks."""
    if event_capacity is None:
        return None, None, None
    cap = apsis.shape[-1]
    slot = jax.lax.broadcasted_iota(jnp.int32, apsis.shape, dimension=1)
    sort_key = jnp.where(apsis, slot, slot + cap)
    _, ids_c, ang_c = jax.lax.sort(
        (sort_key, ids, apsis_angle), dimension=-1, num_keys=1
    )
    count = jnp.sum(apsis, axis=-1, dtype=jnp.int32)
    return count, ids_c[:, :event_capacity], ang_c[:, :event_capacity]


def make_orbit_step(
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    with_prev_slot: bool = False,
    with_dtheta: bool = False,
    event_capacity: int | None = None,
):
    """Build the fused per-snapshot step for a fixed configuration.

    Returns ``step(carry, snap) -> (carry, StepEvents)`` — a pure function
    suitable for ``jax.jit``, ``lax.scan`` and mesh sharding.

    ``with_prev_slot=True`` additionally emits the cur->prev slot map
    (``StepEvents.prev_slot``, used by the on-device count accumulator);
    ``with_dtheta=True`` emits the per-pair angle change in prev layout
    (``StepEvents.dtheta``, needed only by the on-the-fly file writer).
    Both default off: sort-channel bandwidth dominates the step cost, so
    every optional restore channel is pay-for-what-you-use.

    ``event_capacity=K`` additionally compacts the apsis events to the
    front of each halo row (slot order preserved) so hosts fetch
    ``[H, K]`` event IDs/angles plus per-halo counts instead of the full
    ``[H, P]`` masks.  Rows with more than ``K`` events are detectable
    via ``ev_count > K``; the caller falls back to the full mask then.
    """
    if mode not in ("pericentric", "apocentric"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    pericentric = mode == "pericentric"
    invalid = invalid_id_for(id_dtype)

    def step(carry: Carry, snap: SnapshotBatch):
        valid_cur = snap.ids != invalid
        valid_prev = carry.ids != invalid

        frame = region_frame(
            snap.pos,
            snap.vel,
            valid_cur,
            snap.center,
            mass=snap.mass,
            bulk_vel=snap.bulk_vel,
            box_size=box_size,
            hubble_drag=snap.hubble_drag,
        )

        # radial velocities participate in detection only through their
        # signs, so they ride the sort as a 2-bit uint8 channel (1/4 the
        # bandwidth of the f32 they replace); full vrad is carried
        # outside the join (the new carry takes frame.vrad directly)
        def vr_bits(vr):
            return (
                (vr < 0).astype(jnp.uint8) | ((vr > 0).astype(jnp.uint8) << 1)
            )

        def compute(left_vals, this_vals, matched):
            """Apsis detection at the merged (matched-pair) positions.

            At a matched cur entry, ``left_vals`` are its prev partner's
            payloads (garbage elsewhere — everything is masked by
            ``matched``).
            """
            vrb0, rx0, ry0, rz0, ang0 = left_vals
            vrb1, rx1, ry1, rz1, _ = this_vals
            cosang = jnp.clip(rx0 * rx1 + ry0 * ry1 + rz0 * rz1, -1.0, 1.0)
            dtheta = jnp.where(matched, jnp.arccos(cosang), 0.0)
            if pericentric:
                flip = ((vrb0 & 1) > 0) & ((vrb1 & 2) > 0)
            else:
                flip = ((vrb0 & 2) > 0) & ((vrb1 & 1) > 0)
            apsis = matched & flip
            angle_acc = (ang0 + dtheta.astype(angle_dtype)).astype(
                angle_dtype
            )
            apsis_angle = jnp.where(apsis, angle_acc, 0).astype(angle_dtype)
            angle_new = jnp.where(apsis, 0, angle_acc).astype(angle_dtype)
            # (to_prev, to_cur) pairs; apsis_angle and angle_new share a
            # channel (prev/cur destinations are disjoint)
            out = [
                (apsis, None),
                (apsis_angle, angle_new),
            ]
            if with_dtheta:
                out.append((dtheta, None))
            return tuple(out)

        mj = merge_join(
            carry.ids,
            snap.ids,
            invalid,
            values=(
                (vr_bits(carry.vrad), vr_bits(frame.vrad)),
                (carry.rhat[0], frame.rhat[0]),
                (carry.rhat[1], frame.rhat[1]),
                (carry.rhat[2], frame.rhat[2]),
                (carry.angles, None),
            ),
            compute=compute,
            with_prev_slot=with_prev_slot,
        )
        apsis, _ = mj.to_prev[0], mj.to_cur[0]
        apsis_angle, angles_new = mj.to_prev[1], mj.to_cur[1]
        dtheta = mj.to_prev[2] if with_dtheta else None

        ev_count, ev_ids, ev_angles = _compact_events(
            apsis, carry.ids, apsis_angle, event_capacity
        )

        new_carry = Carry(
            ids=snap.ids,
            rhat=frame.rhat,
            vrad=frame.vrad,
            angles=angles_new.astype(angle_dtype),
        )
        events = StepEvents(
            apsis=apsis,
            apsis_angle=apsis_angle,
            dtheta=dtheta,
            matched_prev=mj.matched_prev,
            departed=valid_prev & ~mj.matched_prev,
            entered=valid_cur & ~mj.matched_cur,
            radius=frame.radius,
            bulk_vel=frame.bulk_vel,
            prev_slot=mj.prev_slot_of_cur,
            ev_count=ev_count,
            ev_ids=ev_ids,
            ev_angles=ev_angles,
        )
        return new_carry, events

    return step


def make_static_orbit_step(
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    event_capacity: int | None = None,
):
    """Fast path for *static membership*: ``snap.ids`` is slot-for-slot
    identical to ``carry.ids`` (the caller guarantees it — e.g. the
    tracker checks host-side).  No ID join is needed, so the two variadic
    sorts of the general step disappear and the step is pure elementwise
    work; prev and cur layouts coincide.

    Semantics are identical to :func:`make_orbit_step` restricted to the
    all-matched case.
    """
    if mode not in ("pericentric", "apocentric"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    pericentric = mode == "pericentric"
    invalid = invalid_id_for(id_dtype)

    def step(carry: Carry, snap: SnapshotBatch):
        valid = snap.ids != invalid

        frame = region_frame(
            snap.pos,
            snap.vel,
            valid,
            snap.center,
            mass=snap.mass,
            bulk_vel=snap.bulk_vel,
            box_size=box_size,
            hubble_drag=snap.hubble_drag,
        )
        cosang = jnp.clip(
            carry.rhat[0] * frame.rhat[0]
            + carry.rhat[1] * frame.rhat[1]
            + carry.rhat[2] * frame.rhat[2],
            -1.0,
            1.0,
        )
        dtheta = jnp.where(valid, jnp.arccos(cosang), 0.0)
        if pericentric:
            flip = (carry.vrad < 0) & (frame.vrad > 0)
        else:
            flip = (carry.vrad > 0) & (frame.vrad < 0)
        apsis = valid & flip
        angle_acc = (carry.angles + dtheta.astype(angle_dtype)).astype(
            angle_dtype
        )
        apsis_angle = jnp.where(apsis, angle_acc, 0).astype(angle_dtype)
        angles_new = jnp.where(apsis, 0, angle_acc).astype(angle_dtype)

        ev_count, ev_ids, ev_angles = _compact_events(
            apsis, carry.ids, apsis_angle, event_capacity
        )

        new_carry = Carry(
            ids=snap.ids,
            rhat=frame.rhat,
            vrad=frame.vrad,
            angles=angles_new,
        )
        zero_slots = jax.lax.broadcasted_iota(
            jnp.int32, snap.ids.shape, dimension=1
        )
        events = StepEvents(
            apsis=apsis,
            apsis_angle=apsis_angle,
            dtheta=dtheta,
            matched_prev=valid,
            departed=jnp.zeros_like(valid),
            entered=jnp.zeros_like(valid),
            radius=frame.radius,
            bulk_vel=frame.bulk_vel,
            prev_slot=jnp.where(valid, zero_slots, jnp.int32(-1)),
            ev_count=ev_count,
            ev_ids=ev_ids,
            ev_angles=ev_angles,
        )
        return new_carry, events

    return step


def orbit_step(carry: Carry, snap: SnapshotBatch, mode: str = "pericentric", box_size=None):
    """Convenience jitted single step (fresh trace per (mode, box)).

    ``box_size`` may be a scalar or ``(3,)`` array_like (the loader
    contract allows both) — array boxes are hashed as tuples so they
    can ride the jit static argument.
    """
    if box_size is not None and np.ndim(box_size) > 0:
        box_size = tuple(float(b) for b in np.asarray(box_size))
    return _orbit_step_jit(carry, snap, mode, box_size)


@functools.partial(jax.jit, static_argnames=("mode", "box_size"))
def _orbit_step_jit(carry, snap, mode, box_size):
    return make_orbit_step(mode=mode, box_size=box_size)(carry, snap)
