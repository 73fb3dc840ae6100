"""Sorted-join particle-ID matching.

This replaces the reference's irregular set machinery — ``myin1d``'s
double-argsort (``/root/reference/orbitanalysis/utils.py:4-11``) and the
``setdiff1d``/``in1d``/``delete`` dance in ``compare_radial_velocities``
(``track_orbits.py:300-309``) — with TPU-native joins.

Two implementations:

1. :func:`merge_join` — the hot path.  A *gather-free* sort-merge join:
   concatenate the previous and current ID rows, one variadic
   ``lax.sort`` with the value payloads riding the keys, neighbor-shift
   comparison to pair matching prev/cur entries, then one restore sort
   back to slot order.  On TPU, ``lax.sort`` is a native fast op while
   ``searchsorted``'s binary-search loop and ``take_along_axis``'s
   gathers are catastrophically slow (measured ~350 ms vs ~2 ms for the
   sort at [64, 32768] on v5e) — so everything irregular is expressed as
   sorts of key+payload tuples and element shifts, never as gathers.

2. :func:`match_ids` / :func:`sort_rows` / :func:`gather_rows` — the
   simple searchsorted-based formulation, kept for small/host-side uses
   (progenitor linking, tests) where clarity beats lane efficiency.

Departed/entered/matched sets are boolean masks — no dynamic shapes.

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


class MergeJoin(NamedTuple):
    """Outputs of the gather-free sort-merge join between two ID rows.

    "prev layout" = slot order of the previous row, "cur layout" = slot
    order of the current row (the reference's within-halo output order).
    """

    matched_prev: jnp.ndarray   # [H, P] bool, prev layout
    matched_cur: jnp.ndarray    # [H, P] bool, cur layout
    prev_slot_of_cur: jnp.ndarray  # [H, P] int32, cur layout, -1 = none
    to_prev: tuple              # computed channels, prev layout
    to_cur: tuple               # computed channels, cur layout


def _shift_right(x, fill):
    """Value at the left neighbor (index i-1) along the last axis."""
    return jnp.concatenate(
        [jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1
    )


def _shift_left(x, fill):
    """Value at the right neighbor (index i+1) along the last axis."""
    return jnp.concatenate(
        [x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1
    )


def merge_join(
    prev_ids: jnp.ndarray,   # [H, P]
    cur_ids: jnp.ndarray,    # [H, P]
    invalid_id,
    values: tuple = (),      # ((prev_arr|None, cur_arr|None), ...) pairs
    compute=None,
    with_prev_slot: bool = True,
) -> MergeJoin:
    """Match IDs between two rows, exchanging/transforming payloads —
    with zero gather ops.

    Both rows are concatenated to ``[H, 2P]`` and sorted by ``(id, side)``
    with all payloads riding the sort (``lax.sort`` is variadic and
    TPU-native); matched pairs are then *adjacent* (prev first), so the
    pairing is a neighbor-shift comparison; a second sort keyed by the
    original position restores slot order.

    Channel economy: since every merged position holds *either* a prev
    *or* a cur entry, each value channel is a pair ``(prev_arr, cur_arr)``
    sharing one ``[H, 2P]`` sort operand (pass ``None`` for a missing
    half).  For 32-bit IDs, the side bit is packed into the key
    (``key = id << 1 | side`` as uint32) so the merge sort runs with a
    single comparator key.

    ``compute(left_vals, this_vals, matched) -> outputs`` runs at the
    merged positions: for each channel, ``this_vals`` is the value at the
    position and ``left_vals`` the left neighbor's (for a matched cur
    entry: its prev partner's value; garbage elsewhere — mask with
    ``matched``).  ``outputs`` is a tuple of ``(to_prev, to_cur)`` pairs
    (either half may be ``None``; both halves of a pair must share a
    dtype): ``to_prev`` is routed to the prev partner's slot, ``to_cur``
    stays at the current entry's slot; unmatched slots receive zeros.
    With ``compute=None`` the raw payloads are exchanged (each channel's
    prev half lands in cur layout and vice versa).
    """
    h, p = prev_ids.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (h, p), 1)
    sp = jnp.concatenate([iota, iota + p], axis=1)  # position key

    def cat(a, b):
        return jnp.concatenate([a, b], axis=1)

    id_dt = jnp.dtype(prev_ids.dtype)
    # single-key packing requires ids < 2^31 so that (id << 1 | side)
    # fits in uint32 without aliasing — guaranteed for *signed* <=32-bit
    # dtypes (the invalid sentinel is the dtype max), but NOT for uint32,
    # whose ids may reach 2^32-2 and would collide after the shift
    pack_key = (
        id_dt.itemsize * 8 <= 32 and jnp.issubdtype(id_dt, jnp.signedinteger)
    )
    if pack_key:
        keys = (cat(prev_ids, cur_ids).astype(jnp.uint32) << 1) | (
            sp >= p
        ).astype(jnp.uint32)
        invalid_key = jnp.uint32(int(invalid_id)) << 1
        head, num_keys = (keys, sp), 1  # sp rides as the first payload
    else:
        keys = cat(prev_ids, cur_ids)
        head, num_keys = (keys, sp), 2  # sp is the tie-breaking key

    channels = tuple(
        cat(
            pv if pv is not None else jnp.zeros_like(cv),
            cv if cv is not None else jnp.zeros_like(pv),
        )
        for pv, cv in values
    )

    sorted_ops = jax.lax.sort(
        head + channels, dimension=-1, num_keys=num_keys
    )
    k_s, sp_s = sorted_ops[0], sorted_ops[1]
    chan_s = sorted_ops[2:]
    if pack_key:
        is_cur = (k_s & 1) == 1
        ids_s = k_s >> 1
        valid_key = ids_s != (invalid_key >> 1)
    else:
        is_cur = sp_s >= p
        ids_s = k_s
        valid_key = k_s != invalid_id

    left_is_prev = ~_shift_right(is_cur, True)
    # a cur entry matches when its left neighbor is the prev entry with
    # the same (valid) ID; the (id, side) ordering puts prev first
    match_cur_m = (
        is_cur
        & left_is_prev
        & valid_key
        & (ids_s == _shift_right(ids_s, jnp.asarray(invalid_id, ids_s.dtype)))
    )
    match_prev_m = _shift_left(match_cur_m, False)

    left_vals = tuple(_shift_right(c, 0) for c in chan_s)

    if compute is None:
        # raw exchange: prev half -> cur layout, cur half -> prev layout
        outputs = tuple((c, l) for l, c in zip(left_vals, chan_s))
    else:
        outputs = compute(left_vals, chan_s, match_cur_m)

    # fold each (to_prev, to_cur) pair into one restore channel:
    # to_prev moves one slot left (to the prev partner), to_cur stays;
    # the two position sets are disjoint, unmatched slots get zeros
    def fold(tp, tc):
        if tp is None and tc is None:
            raise ValueError("output pair with both halves None")
        if tp is None:
            z = jnp.zeros_like(tc)
            return jnp.where(match_cur_m, tc, z)
        moved = jnp.where(
            match_prev_m, _shift_left(tp, 0), jnp.zeros_like(tp)
        )
        if tc is None:
            return moved
        return jnp.where(
            is_cur, jnp.where(match_cur_m, tc, jnp.zeros_like(tc)), moved
        )

    out_chans = tuple(fold(tp, tc) for tp, tc in outputs)
    # int8: sort channel bandwidth is the cost driver, and flags need 2 bits
    flags = match_cur_m.astype(jnp.int8) + 2 * match_prev_m.astype(
        jnp.int8
    )
    slot_chan = ()
    if with_prev_slot:
        slot_chan = (
            jnp.where(match_cur_m, _shift_right(sp_s, 0), jnp.int32(-1)),
        )

    # restore to slot order: position key is unique in [0, 2P)
    restore_ops = jax.lax.sort(
        (sp_s, flags) + slot_chan + out_chans, dimension=-1, num_keys=1
    )
    flags_r = restore_ops[1]
    k = 2
    prev_slot = None
    if with_prev_slot:
        prev_slot = restore_ops[k][:, p:]
        k += 1
    out_r = restore_ops[k:]

    def split(chan, tp, tc):
        return (
            chan[:, :p] if tp is not None else None,
            chan[:, p:] if tc is not None else None,
        )

    halves = tuple(split(c, tp, tc) for c, (tp, tc) in zip(out_r, outputs))

    return MergeJoin(
        matched_prev=(flags_r[:, :p] & 2) > 0,
        matched_cur=(flags_r[:, p:] & 1) > 0,
        prev_slot_of_cur=prev_slot,
        to_prev=tuple(hp for hp, _ in halves),
        to_cur=tuple(hc for _, hc in halves),
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
