"""Fully fused join kernel: bitonic merge + apsis detection + unmerge
routing + event compaction in one VMEM-resident Pallas call.

The device passes of the sorted-carry step share the same ``[2P]``
merged domain; running them as separate XLA ops writes and re-reads
every merged channel through HBM.  This kernel keeps the whole chain
in VMEM per halo row:

  merge (block-exchange bitonic stages, swap decisions recorded in a
         positional bit plane)
  -> sign-flip detection + angle accumulate (reference semantics,
     ``/root/reference/orbitanalysis/track_orbits.py:311-351``)
  -> UNMERGE: one combined u32 channel (cur side: packed carry angle
     with match flag in bit 31; prev side: routed apsis angle with the
     event flag in bit 31) replayed backward through the recorded
     network, landing every result at its source position — this
     replaces a 2P-domain log-shift carry compaction and its cumsum
  -> compact the apsis events over the half-size prev P domain
     (key/slot payloads come straight from the input refs)

Outputs per row: ``packed`` angles for the next carry (in the staged —
descending — cur order; callers flip the one plane), the compacted
event channels (prev/ID order; a small host-side ``[H, K]`` sort by
slot restores reference order), and the exact per-row apsis count.

Measured cost structure at [1020, 65536] on v5e (amortized):
~33 ms DMA floor (the pallas pipeline streams at ~235 GB/s vs XLA's
~880), ~21 ms merge+bits+detect, ~18 ms unmerge (latency-bound: a
single-channel serial stage chain), ~18 ms event compaction.  A
runtime ``lax.cond`` in :mod:`orbitanalysis_tpu.ops.sorted_step`
bypasses everything but detection+events when membership is static
(:func:`fused_static_detect`).

Static-kernel split at the same config (round-2 measurement): the
kernel alone runs in ~34 ms — essentially its 11-channel DMA floor;
the in-kernel log-shift event compaction costs only ~4 ms of that
(measured against a compaction-free variant) — while the full aligned
step takes ~56 ms, i.e. ~22 ms is the XLA staging *around* the kernel
(region_frame, the same/FRESH selects, sv/key packing, carry and
event finishing).  The next lever on the flagship path is therefore
moving the bit-packing/select arithmetic into the kernel (streaming
prev ids, +4 B/particle, in exchange for dropping several staged
[H, P] read-modify-write chains), not the compaction or the DMA
pipeline shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orbitanalysis_tpu.ops.pallas_config import default_interpret
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbitanalysis_tpu.ops.pallas_merge import (
    _LANES,
    _cmpx_blocks_rec,
    _roll_flat,
    _uncmpx_blocks,
)
from orbitanalysis_tpu.ops.pallas_compact import _compact_group


def _acos_f32(x):
    """float32 arccos to ~2 ulp (Mosaic has no inverse-trig primitive).

    Cephes ``asinf`` minimax polynomial with the standard range split:
    ``|x| <= 0.5`` via ``pi/2 - asin(x)``, else
    ``2*asin(sqrt((1-|x|)/2))`` reflected for negative ``x``.
    """
    def asin_poly(v, w):
        p = jnp.float32(4.2163199048e-2)
        p = p * w + jnp.float32(2.4181311049e-2)
        p = p * w + jnp.float32(4.5470025998e-2)
        p = p * w + jnp.float32(7.4953002686e-2)
        p = p * w + jnp.float32(1.6666752422e-1)
        return p * w * v + v

    pi = jnp.float32(np.pi)
    ax = jnp.abs(x)
    t = jnp.float32(0.5) * (jnp.float32(1.0) - ax)
    sq = jnp.sqrt(t)
    big_pos = jnp.float32(2.0) * asin_poly(sq, t)
    acos_big = jnp.where(x < 0, pi - big_pos, big_pos)
    acos_small = jnp.float32(np.pi / 2) - asin_poly(x, x * x)
    return jnp.where(ax > 0.5, acos_big, acos_small)


def _fused_kernel(pericentric, invalid_id, n2, rpp, *refs):
    """``rpp`` halo rows per grid program: the merge/unmerge/compaction
    stage chains of each row are data-independent serial dependency
    chains; unrolling several rows in one program hands the Mosaic
    scheduler independent work to interleave into each chain's latency
    bubbles (measured latency-bound: a 6-channel and a 1-channel stage
    cost the same wall time)."""
    for s in range(rpp):
        _fused_kernel_row(pericentric, invalid_id, n2, s, *refs)


def _fused_kernel_row(pericentric, invalid_id, n2, s, *refs):
    (pk, psv, prx, pry, prz, pang,
     ck, csv, crx, cry, crz,
     out_packed, out_evk, out_evsv, out_evang, out_count) = refs

    rows2 = n2 // _LANES
    rows_p = rows2 // 2

    # ---- merge (prev asc + cur desc halves are bitonic), recording
    # each stage's swap decisions in a positional bit plane so the
    # network can be replayed in reverse afterwards ----
    chans = [
        jnp.concatenate([pk[s], ck[s]], axis=0),
        jnp.concatenate([psv[s], csv[s]], axis=0),
        jnp.concatenate([prx[s], crx[s]], axis=0),
        jnp.concatenate([pry[s], cry[s]], axis=0),
        jnp.concatenate([prz[s], crz[s]], axis=0),
        jnp.concatenate([pang[s], jnp.zeros_like(pang[s])], axis=0),
    ]
    bits = jnp.zeros((rows2, _LANES), jnp.uint32)
    j = 0
    k = n2 // 2
    while k >= _LANES:
        chans, bits = _cmpx_blocks_rec(
            chans, bits, j, k // _LANES, rows2, _LANES
        )
        j += 1
        k //= 2
    n_lane_stages = 0
    if k >= 1:
        chans = [c.T for c in chans]
        bits_t = bits.T
        while k >= 1:
            chans, bits_t = _cmpx_blocks_rec(
                chans, bits_t, j, k, _LANES, rows2
            )
            j += 1
            k //= 2
            n_lane_stages += 1
        chans = [c.T for c in chans]
        bits = bits_t.T
    total_stages = j
    key, sv, rx, ry, rz, ang = chans

    # ---- detection in the merged domain ----
    is_cur = (key & 1) == 1
    ids = key >> 1
    valid = ids != jnp.uint32(invalid_id)

    key_l = _roll_flat(key, 1)
    first = (
        jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
        + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    ) == 0
    left_is_prev = (key_l & 1) == 0
    match_cur = (
        is_cur & left_is_prev & valid & (ids == (key_l >> 1)) & ~first
    )
    sv_l = _roll_flat(sv, 1)
    rx_l = _roll_flat(rx, 1)
    ry_l = _roll_flat(ry, 1)
    rz_l = _roll_flat(rz, 1)
    ang_l = _roll_flat(ang, 1)

    vrb = (sv >> 24).astype(jnp.int32)
    vrb_l = (sv_l >> 24).astype(jnp.int32)
    cosang = jnp.clip(rx_l * rx + ry_l * ry + rz_l * rz, -1.0, 1.0)
    dtheta = jnp.where(match_cur, _acos_f32(cosang), 0.0)
    if pericentric:
        flip = ((vrb_l & 1) > 0) & ((vrb & 2) > 0)
    else:
        flip = ((vrb_l & 2) > 0) & ((vrb & 1) > 0)
    apsis = match_cur & flip
    angle_acc = ang_l + dtheta
    apsis_angle = jnp.where(apsis, angle_acc, 0.0)
    angle_new = jnp.where(apsis | ~match_cur, 0.0, angle_acc)

    apsis_i = apsis.astype(jnp.int32)
    out_count[s] = jnp.full((8, _LANES), jnp.sum(apsis_i), jnp.int32)

    # route the event to the prev partner slot (one position left)
    apsis_prev = _roll_flat(apsis_i, -1)
    ev_ang = _roll_flat(apsis_angle, -1)
    # zero the wrapped tail element (circular roll artifact)
    last = (
        jax.lax.broadcasted_iota(jnp.int32, key.shape, 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    ) == (n2 - 1)
    apsis_prev = jnp.where(last, 0, apsis_prev)

    # ---- route results back to source positions via the recorded
    # network, on ONE combined channel (the two sides are disjoint:
    # cur entries carry the packed next-carry angle, prev entries carry
    # the routed apsis angle with the event flag in bit 31).  This
    # replaces the former 2P-domain carry compaction (and its cumsum)
    # with log2(2P) single-channel swap-back stages. ----
    packed = pltpu.bitcast(angle_new, jnp.uint32) | (
        match_cur.astype(jnp.uint32) << 31
    )
    evp = pltpu.bitcast(ev_ang, jnp.uint32) | (
        apsis_prev.astype(jnp.uint32) << 31
    )
    u = jnp.where(is_cur, packed, evp)

    jj = total_stages - 1
    if n_lane_stages:
        ut, bt = u.T, bits.T
        k = 1
        for _ in range(n_lane_stages):
            (ut,) = _uncmpx_blocks([ut], bt, jj, k, _LANES, rows2)
            jj -= 1
            k *= 2
        u = ut.T
    k = _LANES
    while k <= n2 // 2:
        (u,) = _uncmpx_blocks([u], bits, jj, k // _LANES, rows2, _LANES)
        jj -= 1
        k *= 2

    # split: rows [:P] = prev side (event payload at the staged prev
    # positions), rows [P:] = cur side (carry angles in the staged —
    # descending — cur order; the caller flips this one plane back)
    out_packed[s] = u[rows_p:]
    flag = ((u[:rows_p] >> 31) & 1).astype(jnp.int32)
    evang_prev = pltpu.bitcast(
        u[:rows_p] & jnp.uint32(0x7FFFFFFF), jnp.float32
    )

    # ---- event compaction over the (half-size) prev P domain; key/sv
    # payloads come straight from the input refs — prev staging is the
    # carry itself, already in ID order ----
    evk, evsv, evang = _compact_group(
        flag, [pk[s], psv[s], evang_prev], n2 // 2
    )
    rows_k = out_evk.shape[1]
    out_evk[s] = evk[:rows_k]
    out_evsv[s] = evsv[:rows_k]
    out_evang[s] = evang[:rows_k]


def _static_kernel(pericentric, invalid_id, n, native, *refs):
    """Static-membership fast path: carry ids == staged cur ids, so the
    matched pairs are *aligned* — no merge, no carry compaction.  Only
    the sparse event extraction still runs the log-shift compaction.

    The realistic production regime (region membership changes by a few
    percent per snapshot, and not at all between detector invocations of
    the native integrator) makes this the common case; the reference pays
    its full ``myin1d`` join on every snapshot regardless
    (``/root/reference/orbitanalysis/track_orbits.py:293-327``).

    The prev-side *key* channel is never consumed (IDs and the event
    compaction key both come from ``ck``), so it is not an input — one
    less DMA stream.  The stable-layout aligned engine
    (:func:`orbitanalysis_tpu.ops.sorted_step.make_aligned_orbit_step`)
    relies on this: its prev side may hold a *different* (or no) tenant
    at a position.  Such positions carry the FRESH flag in ``psv`` bit
    27 (bit 3 of the unpacked vrb nibble): the sign bits are zero so no
    flip can fire, and the accumulated angle restarts from exactly 0 —
    the stale ``rhat``/``angles`` values streamed alongside are
    suppressed without any caller-side selects.  The sorted engine's
    static path never sets the bit (its vrb occupies bits 24-26), so
    its behavior is unchanged.

    ``native=True`` is the carry-native contract of the aligned engine
    (:func:`orbitanalysis_tpu.ops.sorted_step.make_aligned_native_step`):
    the prev streams are *last step's outputs verbatim* — ``psv`` =
    last staged ``csv`` (so its sign bits belong to whatever tenant the
    position held then, and its bit 27 is last snapshot's staging flag,
    ignored here), and ``pang`` is the packed u32 carry plane (f32
    angle bits 0-30, match flag bit 31) instead of a decoded f32.  The
    FRESH flag therefore comes from the *cur* side — bit 27 of ``csv``,
    set by the host staging where the position's tenant changed
    (:data:`orbitanalysis_tpu.engine.packing.FRESH_BIT`) — and must
    mask the flip explicitly: unlike the select-staged path, stale prev
    sign bits ARE present in ``psv``.
    """
    (psv, prx, pry, prz, pang,
     ck, csv, crx, cry, crz,
     out_packed, out_evk, out_evsv, out_evang, out_count) = refs

    ids = ck[0] >> 1
    valid = ids != jnp.uint32(invalid_id)
    vrb_p = (psv[0] >> 24).astype(jnp.int32)
    vrb_c = (csv[0] >> 24).astype(jnp.int32)

    if native:
        fresh = (vrb_c & 8) > 0
        pang_f = pltpu.bitcast(
            pang[0] & jnp.uint32(0x7FFFFFFF), jnp.float32
        )
    else:
        fresh = (vrb_p & 8) > 0
        pang_f = pang[0]

    cosang = jnp.clip(
        prx[0] * crx[0] + pry[0] * cry[0] + prz[0] * crz[0], -1.0, 1.0
    )
    dtheta = jnp.where(valid, _acos_f32(cosang), 0.0)
    if pericentric:
        flip = ((vrb_p & 1) > 0) & ((vrb_c & 2) > 0)
    else:
        flip = ((vrb_p & 2) > 0) & ((vrb_c & 1) > 0)
    apsis = valid & flip & ~fresh
    angle_acc = jnp.where(fresh, 0.0, pang_f + dtheta)
    apsis_angle = jnp.where(apsis, angle_acc, 0.0)
    angle_new = jnp.where(apsis | ~valid, 0.0, angle_acc)

    out_packed[0] = pltpu.bitcast(angle_new, jnp.uint32) | (
        (valid & ~fresh).astype(jnp.uint32) << 31
    )
    apsis_i = apsis.astype(jnp.int32)
    out_count[0] = jnp.full((8, _LANES), jnp.sum(apsis_i), jnp.int32)

    evk, evsv, evang = _compact_group(
        apsis_i, [ck[0], psv[0], apsis_angle], n
    )
    rows_k = out_evk.shape[1]
    out_evk[0] = evk[:rows_k]
    out_evsv[0] = evsv[:rows_k]
    out_evang[0] = evang[:rows_k]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pericentric", "invalid_id", "k128", "interpret", "native"
    ),
)
def _static_call(pericentric, invalid_id, k128, interpret, native,
                 *arrays):
    h, r, _ = arrays[0].shape
    n = r * _LANES
    spec_in = pl.BlockSpec(
        (1, r, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    kr = k128 // _LANES
    out_shapes = (
        jax.ShapeDtypeStruct((h, r, _LANES), jnp.uint32),    # packed
        jax.ShapeDtypeStruct((h, kr, _LANES), jnp.uint32),   # ev key
        jax.ShapeDtypeStruct((h, kr, _LANES), jnp.int32),    # ev sv
        jax.ShapeDtypeStruct((h, kr, _LANES), jnp.float32),  # ev angle
        jax.ShapeDtypeStruct((h, 8, _LANES), jnp.int32),     # count tile
    )
    out_specs = (
        pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kr, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kr, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kr, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _static_kernel, pericentric, invalid_id, n, native
        ),
        grid=(h,),
        out_shape=out_shapes,
        in_specs=[spec_in] * 10,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*arrays)


def fused_static_detect(
    prev_ops,     # (key_u32 asc, sv, rx, ry, rz, angles) each [H, P]
    cur_asc_ops,  # (key_u32 ASC, sv, rx, ry, rz) each [H, P]
    pericentric: bool,
    invalid_id: int,
    event_capacity: int,
    native: bool = False,
):
    """Aligned detection + event compaction (no merge, no carry routing).

    Preconditions: matched pairs sit at the *same position* in prev and
    cur.  The prev key channel ``prev_ops[0]`` is accepted for signature
    symmetry but never streamed or read — IDs, validity, and the event
    compaction key all come from the cur side.  Positions whose tenant
    changed (the stable-layout engine's entrants/holes) are flagged by
    the caller with bit 27 of the prev ``sv`` channel (FRESH): the sign
    bits are zero so no flip fires, and the kernel restarts the angle
    accumulation at exactly 0, ignoring the stale prev ``rhat``/
    ``angles`` streams.  Same output contract as
    :func:`fused_join_detect` — ``packed`` aligned to the staged cur
    order, compacted events with prev slots, exact counts.

    ``native=True``: the carry-native contract (see
    :func:`_static_kernel`) — ``prev_ops[5]`` is the packed u32 carry
    plane instead of f32 angles, the FRESH flag rides ``cur`` ``sv``
    bit 27, and stale prev sign bits are masked by it in-kernel.
    """
    h, p = prev_ops[0].shape
    if p % _LANES or (p & (p - 1)):
        raise ValueError(
            f"row length must be a power of two >= {_LANES}; got {p}"
        )
    k128 = min(((event_capacity + _LANES - 1) // _LANES) * _LANES, p)
    r = p // _LANES
    arrays = tuple(
        a.reshape(h, r, _LANES)
        for a in tuple(prev_ops[1:]) + tuple(cur_asc_ops)
    )
    interpret = default_interpret()
    packed, evk, evsv, evang, count = _static_call(
        pericentric, int(invalid_id), k128, interpret, native, *arrays
    )
    return (
        packed.reshape(h, p),
        evk.reshape(h, k128),
        evsv.reshape(h, k128),
        evang.reshape(h, k128),
        count[:, 0, 0],
    )


@functools.partial(
    jax.jit,
    static_argnames=("pericentric", "invalid_id", "k128", "interpret",
                     "rpp"),
)
def _fused_call(pericentric, invalid_id, k128, interpret, rpp, *arrays):
    h, r, _ = arrays[0].shape
    n2 = 2 * r * _LANES
    spec_in = pl.BlockSpec(
        (rpp, r, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    kr = k128 // _LANES
    out_shapes = (
        jax.ShapeDtypeStruct((h, r, _LANES), jnp.uint32),    # packed
        jax.ShapeDtypeStruct((h, kr, _LANES), jnp.uint32),   # ev key
        jax.ShapeDtypeStruct((h, kr, _LANES), jnp.int32),    # ev sv
        jax.ShapeDtypeStruct((h, kr, _LANES), jnp.float32),  # ev angle
        jax.ShapeDtypeStruct((h, 8, _LANES), jnp.int32),     # count tile
    )
    out_specs = (
        pl.BlockSpec((rpp, r, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rpp, kr, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rpp, kr, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rpp, kr, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rpp, 8, _LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, pericentric, invalid_id, n2, rpp),
        grid=(h // rpp,),
        out_shape=out_shapes,
        in_specs=[spec_in] * 11,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # v5e has far more physical VMEM than the 16 MiB default
            # scoped limit; whole merged rows live on-chip
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*arrays)


def fused_join_detect(
    prev_ops,   # (key_u32 asc, sv, rx, ry, rz, angles) each [H, P]
    cur_ops,    # (key_u32 DESC, sv, rx, ry, rz) each [H, P]
    pericentric: bool,
    invalid_id: int,
    event_capacity: int,
):
    """Run the fused merge+detect+unmerge kernel.

    Returns ``(packed, ev_key, ev_sv, ev_angle, count)``: ``packed``
    ``[H, P]`` uint32 = next-carry angles (f32 bits) with the match
    flag in bit 31, aligned with the *staged (descending)* cur-side
    order — callers flip this one plane to recover ascending;
    ``ev_*`` ``[H, K128]`` compacted apsis events in prev (ID) order;
    ``count`` ``[H]`` exact apsis counts.
    """
    h, p = prev_ops[0].shape
    if p % _LANES or (p & (p - 1)):
        raise ValueError(
            f"row length must be a power of two >= {_LANES} (bitonic "
            f"merge network); got {p} — pad with round_up_pow2"
        )
    # events compact over the prev P domain (there are at most P)
    k128 = min(((event_capacity + _LANES - 1) // _LANES) * _LANES, p)
    r = p // _LANES
    arrays = tuple(
        a.reshape(h, r, _LANES) for a in tuple(prev_ops) + tuple(cur_ops)
    )
    interpret = default_interpret()
    # rows per grid program (ORBIT_FUSED_RPP): unrolling 2 rows
    # interleaves their stage chains, measured +3.5% per step at
    # [1020, 65536] churn (136.7 -> 132.0 ms) but 5.7x the Mosaic
    # compile time (45 -> 260 s; rpp=4 exceeded 25 min) — so the
    # default stays 1 and the knob is an explicit opt-in for
    # long-running jobs that amortize the compile
    import os

    rpp = int(os.environ.get("ORBIT_FUSED_RPP", "1"))
    rpp = max(rpp, 1)
    while h % rpp:
        rpp -= 1
    packed, evk, evsv, evang, count = _fused_call(
        pericentric, int(invalid_id), k128, interpret, rpp, *arrays
    )
    return (
        packed.reshape(h, p),
        evk.reshape(h, k128),
        evsv.reshape(h, k128),
        evang.reshape(h, k128),
        count[:, 0, 0],
    )
