"""Sorted-join particle-ID matching.

This replaces the reference's irregular set machinery — ``myin1d``'s
double-argsort (``/root/reference/orbitanalysis/utils.py:4-11``) and the
``setdiff1d``/``in1d``/``delete`` dance in ``compare_radial_velocities``
(``track_orbits.py:300-309``) — with a TPU-native sort-merge join:

1. each halo row's IDs are sorted once (``lax.sort`` batches over the halo
   axis natively; padding uses the dtype-max sentinel so it sorts to the
   end);
2. membership and position lookups are vmapped binary searches
   (``searchsorted``) into the sorted row;
3. departed/entered/matched sets become boolean masks — no dynamic shapes.

A row's sorted form is computed once per snapshot and carried to the next
step, so the steady-state cost is one argsort + two batched binary
searches per snapshot.

Assumption (inherited from the reference): particle IDs are unique within
a single halo region.  The same ID may appear in multiple regions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SortedRows(NamedTuple):
    ids: jnp.ndarray     # [H, P] sorted ascending (padding last)
    order: jnp.ndarray   # [H, P] int32: original slot of each sorted entry


def sort_rows(ids: jnp.ndarray) -> SortedRows:
    """Sort each halo row's IDs ascending, keeping the permutation."""
    order = jnp.argsort(ids, axis=-1).astype(jnp.int32)
    return SortedRows(ids=jnp.take_along_axis(ids, order, axis=-1), order=order)


def _row_lookup(sorted_ids: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Positions of ``query`` values in one sorted row (binary search)."""
    return jnp.searchsorted(sorted_ids, query, side="left").astype(jnp.int32)


def match_ids(
    query: jnp.ndarray,        # [H, P] IDs to look up
    ref: SortedRows,           # sorted reference rows
    invalid_id: int,
) -> jnp.ndarray:
    """For each query slot, the reference-row slot holding the same ID.

    Returns ``[H, P]`` int32 indices into the *original* (unsorted)
    reference layout, or ``-1`` where the ID is absent or the slot is
    padding.  This is the batched static-shape equivalent of ``myin1d``
    (``utils.py:4-11``) plus the membership masks of
    ``track_orbits.py:300-309``.
    """
    cap = ref.ids.shape[-1]
    pos = jax.vmap(_row_lookup)(ref.ids, query)
    pos_c = jnp.minimum(pos, cap - 1)
    hit = jnp.take_along_axis(ref.ids, pos_c, axis=-1) == query
    hit = hit & (query != invalid_id)
    slot = jnp.take_along_axis(ref.order, pos_c, axis=-1)
    return jnp.where(hit, slot, jnp.int32(-1))


class TwoWayMatch(NamedTuple):
    prev_slot_of_cur: jnp.ndarray  # [H, P] int32, -1 = entered / padding
    cur_slot_of_prev: jnp.ndarray  # [H, P] int32, -1 = departed / padding


def two_way_match(
    cur_ids: jnp.ndarray,
    cur_sorted: SortedRows,
    prev_ids: jnp.ndarray,
    prev_sorted: SortedRows,
    invalid_id: int,
) -> TwoWayMatch:
    """Bidirectional slot maps between consecutive snapshots' rows."""
    return TwoWayMatch(
        prev_slot_of_cur=match_ids(cur_ids, prev_sorted, invalid_id),
        cur_slot_of_prev=match_ids(prev_ids, cur_sorted, invalid_id),
    )


def gather_rows(values: jnp.ndarray, slots: jnp.ndarray, fill=0):
    """Gather ``values[h, slots[h, i]]`` with ``-1`` slots giving ``fill``.

    ``values`` may be ``[H, P]`` or ``[H, P, d]``; ``slots`` is ``[H, P]``.
    """
    ok = slots >= 0
    idx = jnp.maximum(slots, 0)
    if values.ndim == slots.ndim + 1:
        out = jnp.take_along_axis(values, idx[..., None], axis=1)
        return jnp.where(ok[..., None], out, fill)
    out = jnp.take_along_axis(values, idx, axis=1)
    return jnp.where(ok, out, fill)
