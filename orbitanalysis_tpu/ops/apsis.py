"""The fused per-snapshot orbit-tracking step.

This is the inner loop of the whole framework: one jit'd function that
fuses what the reference spreads across ``region_frame``,
``compare_radial_velocities`` and ``calc_angles``
(``/root/reference/orbitanalysis/track_orbits.py:247-351``) and runs it for
*all* halos at once on the padded ``[n_halos, capacity]`` state:

  gather/pack -> periodic recenter -> bulk velocity -> radial velocity
  -> sorted-join ID match -> sign-flip apsis flag -> angle accumulate/reset

Carried state (the reference's ``*_prev`` arrays at
``track_orbits.py:234-240``) lives in HBM between steps; the host only
receives compact event tensors.  The step is pure and static-shape, so it
can be driven by a Python loop (host-fed snapshots), ``lax.scan``
(HBM-resident snapshots), or sharded over a device mesh along the halo
axis (the TPU-native replacement for the reference's per-halo process
pool, ``track_orbits.py:189-194``).

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

from orbitanalysis_tpu.ops.geometry import region_frame
from orbitanalysis_tpu.ops.join import (
    SortedRows,
    gather_rows,
    match_ids,
    sort_rows,
)
from orbitanalysis_tpu.utils.padding import invalid_id_for


class Carry(NamedTuple):
    """Per-particle state carried across the snapshot scan."""

    ids: jnp.ndarray         # [H, P] particle IDs, load order, sentinel-padded
    sorted_ids: jnp.ndarray  # [H, P] sorted row form (reused next step)
    order: jnp.ndarray       # [H, P] argsort permutation of ``ids``
    rhat: jnp.ndarray        # [H, P, 3]
    vrad: jnp.ndarray        # [H, P]
    angles: jnp.ndarray      # [H, P] cumulative angle since last apsis/entry


class SnapshotBatch(NamedTuple):
    """One snapshot's padded device input."""

    ids: jnp.ndarray                    # [H, P]
    pos: jnp.ndarray                    # [H, P, 3]
    vel: jnp.ndarray                    # [H, P, 3]
    center: jnp.ndarray                 # [H, 3]
    mass: Optional[jnp.ndarray] = None      # [H, P] (None = equal masses)
    bulk_vel: Optional[jnp.ndarray] = None  # [H, 3] catalog bulk velocities
    hubble_drag: jnp.ndarray | float = 0.0  # scalar H(z)/(1+z); 0 = off


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


def init_carry(
    n_halos: int,
    capacity: int,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
    pos_dtype=jnp.float32,
) -> Carry:
    """All-invalid carry: every halo behaves as 'no progenitor yet'."""
    invalid = invalid_id_for(id_dtype)
    ids = jnp.full((n_halos, capacity), invalid, dtype=id_dtype)
    order = jnp.tile(jnp.arange(capacity, dtype=jnp.int32)[None, :], (n_halos, 1))
    return Carry(
        ids=ids,
        # distinct buffer from ``ids``: the two leaves must not alias, or
        # argument donation would donate the same buffer twice
        sorted_ids=jnp.full((n_halos, capacity), invalid, dtype=id_dtype),
        order=order,
        rhat=jnp.zeros((n_halos, capacity, 3), dtype=pos_dtype),
        vrad=jnp.zeros((n_halos, capacity), dtype=pos_dtype),
        angles=jnp.zeros((n_halos, capacity), dtype=angle_dtype),
    )


def make_orbit_step(
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    angle_dtype=jnp.float32,
):
    """Build the fused per-snapshot step for a fixed configuration.

    Returns ``step(carry, snap) -> (carry, StepEvents)`` — a pure function
    suitable for ``jax.jit``, ``lax.scan`` and mesh sharding.
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

        cur_sorted = sort_rows(snap.ids)
        prev_sorted = SortedRows(ids=carry.sorted_ids, order=carry.order)
        prev_slot_of_cur = match_ids(snap.ids, prev_sorted, invalid)
        cur_slot_of_prev = match_ids(carry.ids, cur_sorted, invalid)

        matched_prev = cur_slot_of_prev >= 0
        departed = valid_prev & ~matched_prev
        entered = valid_cur & (prev_slot_of_cur < 0)

        # --- prev-layout: apsis detection + angle accumulation ---------
        vr_now = gather_rows(frame.vrad, cur_slot_of_prev)
        rhat_now = gather_rows(frame.rhat, cur_slot_of_prev)
        cosang = jnp.clip(
            jnp.sum(carry.rhat * rhat_now, axis=-1), -1.0, 1.0
        )
        dtheta = jnp.where(matched_prev, jnp.arccos(cosang), 0.0)

        if pericentric:
            flip = (carry.vrad < 0) & (vr_now > 0)
        else:
            flip = (carry.vrad > 0) & (vr_now < 0)
        apsis = matched_prev & flip

        angle_acc = (carry.angles + dtheta.astype(angle_dtype)).astype(
            angle_dtype
        )
        apsis_angle = jnp.where(apsis, angle_acc, 0).astype(angle_dtype)
        angle_after = jnp.where(apsis, 0, angle_acc).astype(angle_dtype)

        # --- cur-layout: new carried angles -----------------------------
        angles_new = gather_rows(angle_after, prev_slot_of_cur).astype(
            angle_dtype
        )

        new_carry = Carry(
            ids=snap.ids,
            sorted_ids=cur_sorted.ids,
            order=cur_sorted.order,
            rhat=frame.rhat,
            vrad=frame.vrad,
            angles=angles_new,
        )
        events = StepEvents(
            apsis=apsis,
            apsis_angle=apsis_angle,
            dtheta=dtheta,
            matched_prev=matched_prev,
            departed=departed,
            entered=entered,
            radius=frame.radius,
            bulk_vel=frame.bulk_vel,
        )
        return new_carry, events

    return step


@functools.partial(jax.jit, static_argnames=("mode", "box_size"))
def orbit_step(carry: Carry, snap: SnapshotBatch, mode: str = "pericentric", box_size=None):
    """Convenience jitted single step (fresh trace per (mode, box))."""
    return make_orbit_step(mode=mode, box_size=box_size)(carry, snap)
