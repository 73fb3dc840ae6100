"""Progenitor linking: build ``main_branches`` without a merger tree.

TPU-first re-design of ``/root/reference/orbitanalysis/progenitors.py``:

- :func:`get_central_particle_ids` — the n innermost particles per halo
  (reference: per-region ``argsort`` loop, ``progenitors.py:52-53``).
  Implemented as a single vectorized segmented partial sort (NumPy host
  path) with a padded-``top_k`` JAX device path for large catalogs.
- :func:`find_main_progenitors` — majority vote of tracked central
  particles over candidate halos (reference: per-descendant Python loop
  with ``np.unique``, ``progenitors.py:103-116``).  Implemented as one
  vectorized sort + run-length count + segmented argmax; ties break to
  the smaller halo number, matching the reference's first-argmax.
"""

from __future__ import annotations

import numpy as np

from orbitanalysis_tpu.utils.numerics import periodic_displacement


def get_central_particle_ids(snapshot, halo_positions, n=100):
    """IDs of the ``n`` particles closest to each halo center.

    ``snapshot`` follows the loader contract (ids, coordinates,
    region_offsets, optional box_size; ``progenitors.py:12-21``).  Returns
    ``(central_ids, offsets)`` with per-halo blocks ordered by increasing
    radius, like the reference.
    """
    ids = np.asarray(snapshot["ids"])
    coords = np.asarray(snapshot["coordinates"], dtype=np.float64)
    offsets = np.asarray(snapshot["region_offsets"], dtype=np.int64)
    n_halos = len(offsets)
    lengths = np.diff(np.concatenate((offsets, [len(ids)])))

    halo_positions = np.atleast_2d(np.asarray(halo_positions, dtype=np.float64))
    seg = np.repeat(np.arange(n_halos), lengths)
    rel = coords - halo_positions[seg]
    if "box_size" in snapshot:
        rel = np.asarray(periodic_displacement(rel, snapshot["box_size"]))
    rads = np.sqrt((rel * rel).sum(-1))

    # One global lexsort (segment-major, radius-minor) replaces the
    # reference's per-region argsort loop; then keep rank < n per segment.
    order = np.lexsort((rads, seg))
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    rank = np.arange(len(ids)) - starts[seg]
    keep = rank < n
    central_ids = ids[order][keep]
    out_lens = np.minimum(lengths, n)
    out_offsets = np.concatenate(([0], np.cumsum(out_lens)))[:-1]
    return central_ids, out_offsets


def get_central_particle_ids_device(snapshot, halo_positions, n=100):
    """Device-path variant of :func:`get_central_particle_ids` for large
    catalogs: pad regions to ``[n_halos, capacity]`` and run a batched
    ``lax.top_k`` on negated radii on the accelerator.

    Returns the same ``(central_ids, offsets)`` contract, with per-halo
    blocks ordered by increasing radius.
    """
    import jax
    import jax.numpy as jnp

    from orbitanalysis_tpu.utils.padding import (
        invalid_id_for,
        pack_ragged,
        round_up,
    )

    ids = np.asarray(snapshot["ids"])
    coords = np.asarray(snapshot["coordinates"], dtype=np.float32)
    offsets = np.asarray(snapshot["region_offsets"], dtype=np.int64)
    n_halos = len(offsets)
    lengths = np.diff(np.concatenate((offsets, [len(ids)])))
    capacity = round_up(int(lengths.max(initial=1)))
    invalid = invalid_id_for(np.int32)

    ids_p = pack_ragged(
        ids.astype(np.int32), offsets, n_halos, capacity, fill=invalid
    )
    pos_p = pack_ragged(coords, offsets, n_halos, capacity, fill=0.0)
    centers = np.atleast_2d(np.asarray(halo_positions, dtype=np.float32))

    @jax.jit
    def topk(ids_p, pos_p, centers):
        rel = pos_p - centers[:, None, :]
        if "box_size" in snapshot:
            rel = periodic_displacement(rel, snapshot["box_size"])
        r2 = jnp.sum(rel * rel, axis=-1)
        r2 = jnp.where(ids_p != invalid, r2, jnp.inf)  # padding last
        # top_k of -r2 = the n smallest radii; top_k returns values in
        # descending order, i.e. radii ascending — the reference's order
        neg, idx = jax.lax.top_k(-r2, min(n, capacity))
        return jnp.take_along_axis(ids_p, idx, axis=-1), neg

    ids_k, neg = jax.device_get(topk(ids_p, pos_p, centers))
    k = ids_k.shape[1]
    counts = np.minimum(lengths, n)
    sel = np.arange(k)[None, :] < counts[:, None]
    central_ids = ids_k[sel]
    out_offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    return central_ids.astype(ids.dtype), out_offsets


def find_main_progenitors_device(halo_pids, halo_offsets, tracked_pids,
                                 tracked_offsets):
    """Device path of :func:`find_main_progenitors` (round-3 review
    item 6): the catalog-sized work — sorting ``halo_pids`` and the
    membership lookup — runs on the accelerator as one ``lax.sort`` +
    ``searchsorted``, and the per-descendant majority vote is a
    bit-packed ``segment_max`` (count in the high bits, complemented
    halo number in the low bits, so ties break to the smaller halo —
    the reference's first-argmax, ``progenitors.py:103-116``).  Only
    the ``[n_desc]`` winners cross back to the host.

    Falls back to the host implementation when particle IDs are 64-bit
    (the device path streams 32-bit keys without x64) or the vote-count
    x halo-number packing exceeds 31 bits.  Results are identical to
    :func:`find_main_progenitors` in all cases.
    """
    import jax
    import jax.numpy as jnp

    halo_pids = np.asarray(halo_pids)
    tracked_pids = np.asarray(tracked_pids)
    halo_offsets = np.asarray(halo_offsets, dtype=np.int64)
    tracked_offsets = np.asarray(tracked_offsets, dtype=np.int64)
    n_desc = len(tracked_offsets)
    if len(halo_pids) == 0 or len(tracked_pids) == 0:
        return [-1] * n_desc

    halo_lens = np.diff(np.concatenate((halo_offsets, [len(halo_pids)])))
    tracked_lens = np.diff(
        np.concatenate((tracked_offsets, [len(tracked_pids)]))
    )
    n_halos = len(halo_lens)
    bits_c = int(tracked_lens.max(initial=1)).bit_length()
    bits_h = max(int(n_halos - 1).bit_length(), 1)
    if (halo_pids.dtype.itemsize > 4 or tracked_pids.dtype.itemsize > 4
            or bits_c + bits_h > 31):
        return find_main_progenitors(
            halo_pids, halo_offsets, tracked_pids, tracked_offsets
        )

    # tracked side is small (n_desc x ~100): dedupe on host like the
    # reference (progenitors.py:82-84 — duplicates vote only once)
    _, unique_inds = np.unique(tracked_pids, return_index=True)
    vote_ok = np.zeros(len(tracked_pids), dtype=bool)
    vote_ok[unique_inds] = True
    halo_number = np.repeat(
        np.arange(n_halos, dtype=np.int32), halo_lens
    )
    desc_number = np.repeat(
        np.arange(n_desc, dtype=np.int32), tracked_lens
    )
    halo_mask = np.int32((1 << bits_h) - 1)

    @jax.jit
    def vote(h_pids, h_num, t_pids, d_num, ok):
        s_pids, s_num = jax.lax.sort(
            (h_pids.astype(jnp.int32), h_num), num_keys=1,
            is_stable=False,
        )
        pos = jnp.clip(
            jnp.searchsorted(s_pids, t_pids.astype(jnp.int32)),
            0, s_pids.shape[0] - 1,
        )
        found = (s_pids[pos] == t_pids) & ok
        v = s_num[pos]
        # votes -> per-(desc, halo) counts: 2-key sort + run-length
        ds, vs = jax.lax.sort(
            (jnp.where(found, d_num, jnp.int32(n_desc)),
             jnp.where(found, v, jnp.int32(0))),
            num_keys=2, is_stable=False,
        )
        new_run = jnp.concatenate([
            jnp.ones((1,), bool),
            (ds[1:] != ds[:-1]) | (vs[1:] != vs[:-1]),
        ])
        run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        counts = jax.ops.segment_sum(
            jnp.ones_like(ds), run_id, num_segments=ds.shape[0],
        )[run_id]                     # run length, broadcast per element
        key = (counts << bits_h) | (halo_mask - vs)
        first = new_run & (ds < n_desc)
        best = jax.ops.segment_max(
            jnp.where(first, key, 0),
            jnp.where(first, ds, jnp.int32(n_desc)),
            num_segments=n_desc + 1,
        )[:n_desc]
        return jnp.where(
            best > 0, halo_mask - (best & halo_mask), jnp.int32(-1)
        )

    out = np.asarray(jax.device_get(vote(
        jnp.asarray(halo_pids.astype(np.int32)),
        jnp.asarray(halo_number),
        jnp.asarray(tracked_pids.astype(np.int32)),
        jnp.asarray(desc_number),
        jnp.asarray(vote_ok),
    )))
    return list(out.astype(np.int64))


def find_main_progenitors(halo_pids, halo_offsets, tracked_pids,
                          tracked_offsets):
    """Majority-vote main progenitors (``progenitors.py:59-117``).

    For each descendant's tracked central-particle block, find which halo
    of the earlier catalog contains the plurality of those particles.
    Returns a list with one halo number per descendant, −1 where no
    tracked particle is found in any halo.
    """
    halo_pids = np.asarray(halo_pids)
    tracked_pids = np.asarray(tracked_pids)
    halo_offsets = np.asarray(halo_offsets, dtype=np.int64)
    tracked_offsets = np.asarray(tracked_offsets, dtype=np.int64)

    n_desc = len(tracked_offsets)
    if len(halo_pids) == 0 or len(tracked_pids) == 0:
        return [-1] * n_desc
    halo_lens = np.diff(np.concatenate((halo_offsets, [len(halo_pids)])))
    tracked_lens = np.diff(np.concatenate((tracked_offsets, [len(tracked_pids)])))

    # de-duplicate tracked IDs, keeping first occurrences
    # (``progenitors.py:82-84``): duplicates vote only once.
    _, unique_inds = np.unique(tracked_pids, return_index=True)
    dup_mask = np.ones(len(tracked_pids), dtype=bool)
    dup_mask[unique_inds] = False

    halo_number = np.repeat(np.arange(len(halo_lens)), halo_lens)
    desc_number = np.repeat(np.arange(n_desc), tracked_lens)

    # membership + lookup via one sort of the catalog (both inputs are
    # non-empty here: the short-circuit above handled the empty cases)
    order = np.argsort(halo_pids, kind="stable")
    sorted_pids = halo_pids[order]
    pos = np.searchsorted(sorted_pids, tracked_pids)
    pos_c = np.minimum(pos, len(sorted_pids) - 1)
    found = (sorted_pids[pos_c] == tracked_pids) & ~dup_mask
    votes_halo = halo_number[order[pos_c]]

    d = desc_number[found]
    v = votes_halo[found]
    if len(d) == 0:
        return [-1] * n_desc

    # count votes per (descendant, halo) pair: sort pairs, run-length encode
    pair_order = np.lexsort((v, d))
    ds, vs = d[pair_order], v[pair_order]
    new_pair = np.concatenate(
        ([True], (ds[1:] != ds[:-1]) | (vs[1:] != vs[:-1]))
    )
    pair_start = np.where(new_pair)[0]
    pair_counts = np.diff(np.concatenate((pair_start, [len(ds)])))
    pair_desc = ds[pair_start]
    pair_halo = vs[pair_start]

    # segmented argmax over descendants; ties -> smaller halo number
    # (reference np.argmax returns the first max in ascending-halo order)
    best_order = np.lexsort((pair_halo, -pair_counts, pair_desc))
    bd = pair_desc[best_order]
    first = np.concatenate(([True], bd[1:] != bd[:-1]))
    winners_desc = bd[first]
    winners_halo = pair_halo[best_order][first]

    out = -np.ones(n_desc, dtype=np.int64)
    out[winners_desc] = winners_halo
    return list(out)
