"""Device-resident snapshot-sequence driver via ``lax.scan``.

The reference walks the snapshot axis with a host Python loop, reloading
state each iteration (``/root/reference/orbitanalysis/track_orbits.py:104``).
The time axis is a true dependency chain (each step consumes the previous
step's per-particle state, ``track_orbits.py:234-240``), so the TPU-native
formulation is a ``lax.scan`` with the per-particle carry resident in HBM
and the snapshot stack either pre-staged in HBM or fed per-step by the
host pipeline in :mod:`orbitanalysis_tpu.engine.tracker`.

Two variants:

- :func:`scan_events` — emits the per-step apsis event tensors needed by
  the savefile writer (apsis mask + angle at apsis, prev-snapshot layout);
- :func:`scan_counts` — accumulates per-particle apsis counts in the carry
  and emits nothing per step: the pure-throughput configuration used for
  benchmarking and for on-device orbit-count censuses
  (the device-side equivalent of ``postprocessing.py:133-142``'s
  per-halo counting, without materializing intermediate catalogs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbitanalysis_tpu.ops.apsis import Carry, SnapshotBatch, make_orbit_step


def _with_drag_axis(snaps: SnapshotBatch) -> SnapshotBatch:
    """Broadcast a scalar ``hubble_drag`` to the snapshot axis so every
    leaf scans (lax.scan rejects axis-less leaves)."""
    drag = snaps.hubble_drag
    if jnp.ndim(drag) == 0:
        n = snaps.ids.shape[0]
        drag = jnp.broadcast_to(jnp.asarray(drag, jnp.float32), (n,))
        return snaps._replace(hubble_drag=drag)
    return snaps


class CountingCarry(NamedTuple):
    """Carry for the count-accumulating scan: the tracking carry plus a
    per-slot apsis counter aligned with the *current* snapshot layout."""

    track: Carry
    counts: jnp.ndarray  # [H, P] int32, current-snapshot slot layout


def scan_events(
    carry: Carry,
    snaps: SnapshotBatch,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
):
    """Run the fused orbit step over a stacked snapshot sequence.

    ``snaps`` is a :class:`SnapshotBatch` whose leaves carry a leading
    snapshot axis ``[S, ...]`` (``mass``/``bulk_vel`` may be ``None``;
    ``hubble_drag`` may be scalar or ``[S]``).  Returns
    ``(final_carry, (apsis [S,H,P] bool, apsis_angle [S,H,P]))`` with the
    event tensors in previous-snapshot slot layout, exactly what the
    savefile writer compacts (``track_orbits.py:199-217``).
    """
    step = make_orbit_step(mode=mode, box_size=box_size, id_dtype=id_dtype)

    def body(c, s):
        c, ev = step(c, s)
        return c, (ev.apsis, ev.apsis_angle)

    return jax.lax.scan(body, carry, _with_drag_axis(snaps))


def scan_events_compact(
    carry: Carry,
    snaps: SnapshotBatch,
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
):
    """Like :func:`scan_events` but with on-device event compaction: per
    step the events are sorted to the front of each halo row so the
    output is ``(ev_count [S,H], ev_ids [S,H,K], ev_angles [S,H,K])`` —
    an ~P/K cut in HBM event traffic and host transfer.  Rows where
    ``ev_count > K`` overflowed; re-run those snapshots through
    :func:`scan_events` (or raise ``event_capacity``).
    """
    step = make_orbit_step(
        mode=mode, box_size=box_size, id_dtype=id_dtype,
        event_capacity=event_capacity,
    )

    def body(c, s):
        c, ev = step(c, s)
        return c, (ev.ev_count, ev.ev_ids, ev.ev_angles)

    return jax.lax.scan(body, carry, _with_drag_axis(snaps))


def scan_events_sorted(
    carry,
    snaps: SnapshotBatch,
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    merge_impl: str = "lax_sort",
    compact_impl: str = "lax_sort",
    cur_presorted: bool = False,
    fused: bool = False,
    soa_batch: bool = False,
):
    """Sorted-carry variant of :func:`scan_events_compact` — identical
    compact event stream, one fewer sort per step; with
    ``merge_impl="pallas"`` the merge sort becomes a VMEM-resident
    bitonic merge and with ``compact_impl="pallas"`` the carry/event
    extraction becomes a log-shift compaction kernel.  With snapshots
    staged ID-sorted (``ops.sorted_step.presort_snapshot``), pass
    ``cur_presorted=True`` and the per-step cur-side sort disappears
    too; staged SoA (``presort_snapshot(..., soa=True)``), pass
    ``soa_batch=True`` and the per-step AoS transpose disappears as
    well.  ``carry`` is a
    :class:`orbitanalysis_tpu.ops.sorted_step.SortedCarry`.
    """
    from orbitanalysis_tpu.ops.sorted_step import make_sorted_orbit_step

    step = make_sorted_orbit_step(
        event_capacity, mode=mode, box_size=box_size, id_dtype=id_dtype,
        merge_impl=merge_impl, compact_impl=compact_impl,
        cur_presorted=cur_presorted, fused=fused, soa_batch=soa_batch,
    )

    def body(c, s):
        c, ev = step(c, s)
        return c, (ev.count, ev.ids, ev.angles)

    return jax.lax.scan(body, carry, _with_drag_axis(snaps))


def scan_events_aligned(
    carry,
    snaps: SnapshotBatch,
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    id_dtype=jnp.int32,
    soa_batch: bool = False,
):
    """Stable-layout variant of :func:`scan_events_sorted`: snapshots
    staged by :func:`orbitanalysis_tpu.engine.packing.stage_batch_aligned`
    are element-wise aligned across the sequence, so every step runs the
    carry-native static detection kernel with **no device-side join and
    no XLA carry re-encode** — membership churn at the kernel's DMA
    floor.  ``carry`` is an
    :class:`orbitanalysis_tpu.ops.sorted_step.AlignedCarry`
    (:func:`~orbitanalysis_tpu.ops.sorted_step.init_aligned_carry`);
    events come back ``(count [S,H], ids [S,H,K], angles [S,H,K],
    slots [S,H,K])`` with prev load slots for host-side
    reference-order restoration.
    """
    from orbitanalysis_tpu.ops.sorted_step import make_aligned_native_step

    step = make_aligned_native_step(
        event_capacity, mode=mode, box_size=box_size, id_dtype=id_dtype,
        soa_batch=soa_batch,
    )

    def body(c, s):
        c, ev = step(c, s)
        return c, (ev.count, ev.ids, ev.angles, ev.slots)

    return jax.lax.scan(body, carry, _with_drag_axis(snaps))


def scan_counts(
    carry: CountingCarry,
    snaps: SnapshotBatch,
    mode: str = "pericentric",
    box_size=None,
    angle_cut: float = 0.0,
    id_dtype=jnp.int32,
):
    """Scan that keeps cumulative per-particle apsis counts on device.

    Counts ride the ID-matched slot permutation each step (entered
    particles restart at 0, matching region-entry semantics at
    ``track_orbits.py:180-183``).  ``angle_cut`` filters spurious
    in-subhalo passages exactly like collation does
    (``postprocessing.py:121-128``) but on device, fused into the scan.

    Returns ``(final CountingCarry, total apsis events per step [S])``.
    """
    from orbitanalysis_tpu.ops.join import gather_rows

    step = make_orbit_step(
        mode=mode, box_size=box_size, id_dtype=id_dtype, with_prev_slot=True
    )

    def body(c: CountingCarry, s):
        track, ev = step(c.track, s)
        hit = ev.apsis & (ev.apsis_angle > angle_cut)
        counts_prev = c.counts + hit.astype(c.counts.dtype)
        # re-index counts from prev layout to the new snapshot's layout
        # via the slot map the step already computed; entered / padding
        # slots reset to zero (region-entry semantics).
        counts_new = gather_rows(counts_prev, ev.prev_slot, fill=0)
        return (
            CountingCarry(track=track, counts=counts_new),
            jnp.sum(hit, dtype=jnp.int32),
        )

    return jax.lax.scan(body, carry, _with_drag_axis(snaps))


def stack_batches(batches):
    """Stack per-snapshot :class:`SnapshotBatch` pytrees along a new
    leading snapshot axis (host-side helper for pre-staging sequences)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
