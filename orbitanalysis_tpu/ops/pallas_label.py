"""Fully fused label-native detection kernel.

One ``pallas_call`` per snapshot does everything the label-native step
needs between the bulk-velocity moments and the event compaction:
per-particle halo frame rows (``table[label]`` via an exact bf16x3
one-hot MXU dot — bit-identical to a gather), radial geometry (the
reference's region-frame quantities,
``/root/reference/orbitanalysis/track_orbits.py:276-288``), apsis
detection (sign flip while the label is unchanged,
``track_orbits.py:300-309`` entered-set semantics), angle
accumulation, the packed carry update, and the positional payload
words for the compaction network.

Why fused: the unfused pallas2 path writes the ``[6, N]`` frame rows
to HBM only for the very next XLA pass to read them back (~48
B/particle of pure round-trip at the bench shape), and the XLA
detect chain re-reads ``pos``/``vel`` besides.  This kernel touches
each plane exactly once: reads ``label + pos(3) + vel(3) + carry
(sv, rhat, packed)``, writes ``carry' + payload + count`` — 72
B/particle unpacked, 56 with the octahedral rhat carry, versus ~148
for the unfused chain.  Measured at the bench shape (N=2.1M x H=64,
v5e): full step 1.40 -> 0.63 ms (`benchmarks/label_ablation.py`).

Exactness: the one-hot row select is bit-identical to a gather (sum
of one nonzero product per exact bf16 split piece); the geometry and
detection math are the same jnp expressions the XLA path runs; the
payload's 15-bit angle field is a manual round-to-nearest-even
f32->f16 conversion (integer ops only — Mosaic has no f16 on this
target) that matches ``astype(float16)`` bit-for-bit for all finite
non-negative inputs, subnormals included
(``tests/test_label.py::test_f16_bits_rne``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_config import default_interpret
from .pallas_frames import _split3

__all__ = ["fused_label_detect", "detect_label_pallas", "f16_bits_rne"]

#: one-hot VMEM ceiling: bf16 [H, W] must fit alongside the streams
_MAX_ONEHOT_BYTES = 32 * 1024 * 1024


def f16_bits_rne(x):
    """IEEE f32 -> f16 bit pattern (round-to-nearest-even) for finite
    ``x >= 0``, as uint32 — integer ops only, so it runs inside Mosaic
    kernels (no native f16 on this target).  Matches
    ``bitcast(x.astype(float16), uint16)`` exactly for every finite
    non-negative f32, including f16 subnormals; values above the f16
    range clamp to 0x7BFF (65504.0) instead of inf so the payload's
    15-bit angle field never aliases the position bits."""
    # int32 arithmetic throughout: x >= 0 finite keeps every
    # intermediate below 2**31, and Mosaic has no unsigned vector
    # min/compare (arith.minui is unsupported).  CONSTANT shifts only:
    # the original subnormal path shifted by a per-element amount
    # (m2 >> (126 - e)), and TPU variable-amount vector shifts lower
    # so poorly that payload generation alone cost ~5.8 ms/scan at the
    # bench shape (benchmarks/aligned_ablation.py det+pay row) — ~40x
    # the cost of this formulation.
    u = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = u >> 23  # biased f32 exponent (sign bit 0)
    # normal f16 (e >= 113): fold RNE into one add — carries propagate
    # from the mantissa into the exponent exactly as IEEE requires
    rn = u + 0x0FFF + ((u >> 13) & 1)
    h_norm = (rn - 0x38000000) >> 13
    h_norm = jnp.minimum(h_norm, 0x7BFF)
    # subnormal f16 (e < 113, i.e. x < 2**-14): the f16 subnormal
    # lattice is m * 2**-24, m in [0, 1024), so the bit pattern is
    # simply RNE(x * 2**24) — a constant power-of-two scale (exact)
    # plus the hardware round-half-even.  x = 2**-14 itself scales to
    # exactly 1024 = 0x400, the first NORMAL encoding, so the lattice
    # is seamless at the boundary (values just under it that round up
    # also produce the correct normal bits).  e < 102 underflows to 0
    # through the same round.
    # clamp the product before the int cast: for e >= 113 (incl.
    # inf/NaN) h_sub is discarded by the where, but x * 2**24 would be
    # out of int32 range there and out-of-range f32->i32 conversion is
    # implementation-defined in XLA — keep every lane's conversion
    # defined (the clamp is a no-op on the e < 113 lanes that are kept)
    h_sub = jnp.round(
        jnp.minimum(x * jnp.float32(16777216.0), jnp.float32(2e9))
    ).astype(jnp.int32)
    h = jnp.where(e >= 113, h_norm, h_sub)
    return h.astype(jnp.uint32)


def _oct_encode_kernel(rx, ry, rz):
    """Octahedral pack (``utils.numerics.oct_encode``) as [1, W] planes."""
    s = jnp.maximum(jnp.abs(rx) + jnp.abs(ry) + jnp.abs(rz), 1e-30)
    px, py = rx / s, ry / s
    fx = (1.0 - jnp.abs(py)) * jnp.where(px >= 0, 1.0, -1.0)
    fy = (1.0 - jnp.abs(px)) * jnp.where(py >= 0, 1.0, -1.0)
    px = jnp.where(rz < 0, fx, px)
    py = jnp.where(rz < 0, fy, py)
    # f32 <-> u32 casts are unsupported in Mosaic on this target; the
    # quantized values fit i32, so route through it (bit pattern for
    # 0..65535 is identical)
    qx = jnp.clip(
        jnp.round((px * 0.5 + 0.5) * 65535.0), 0, 65535
    ).astype(jnp.int32).astype(jnp.uint32)
    qy = jnp.clip(
        jnp.round((py * 0.5 + 0.5) * 65535.0), 0, 65535
    ).astype(jnp.int32).astype(jnp.uint32)
    return qx | (qy << 16)


def _oct_decode_kernel(packed):
    """Inverse of :func:`_oct_encode_kernel` -> (rx, ry, rz) planes."""
    # u32 -> f32 is unsupported in Mosaic; both fields are <= 0xFFFF
    # so the i32 detour is exact
    qx = (packed & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(
        jnp.float32)
    qy = (packed >> 16).astype(jnp.int32).astype(jnp.float32)
    px = qx * (2.0 / 65535.0) - 1.0
    py = qy * (2.0 / 65535.0) - 1.0
    z = 1.0 - jnp.abs(px) - jnp.abs(py)
    t = jnp.maximum(-z, 0.0)
    x = px - jnp.where(px >= 0, t, -t)
    y = py - jnp.where(py >= 0, t, -t)
    inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-30)
    return x * inv, y * inv, z * inv


def _detect_core(pericentric, box_size, rhat_packed,
                 lab, pos3, vel3, crow3, brow3, sv, rh, pk, hub,
                 pos_iota=None):
    """Shared elementwise detect math — geometry, apsis flip, angle
    accumulation, carry planes, positional payload — on 2D planes of
    ANY shape (the fused kernel passes [1, W] strips, the split detect
    kernel full-vreg [rb, W] tiles, the detect+compact kernel
    lane-major [B2, 128] tiles with an explicit ``pos_iota`` giving
    each element's position within its compaction row).  ``pos3``/
    ``vel3``/``crow3``/``brow3`` are per-axis plane tuples; ``rh`` is
    the packed uint32 plane or a 3-tuple.  Returns ``(osv, orh
    [packed plane | 3-tuple], opk, payload, apsis)``; callers reduce
    ``apsis`` to counts with their own output geometry."""
    from .pallas_step import _acos_f32

    rel = []
    r2 = jnp.zeros(lab.shape, jnp.float32)
    for d in range(3):
        rd = pos3[d] - crow3[d]
        if box_size is not None:
            rd = rd - box_size * jnp.round(rd / box_size)
        rel.append(rd)
        r2 = r2 + rd * rd
    r = jnp.sqrt(r2)
    inv_r = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    rhat = [rd * inv_r for rd in rel]
    vr = sum(
        rhat[d] * (vel3[d] - brow3[d] + hub * rel[d])
        for d in range(3)
    )
    vrb = (vr < 0).astype(jnp.int32) | ((vr > 0).astype(jnp.int32) << 1)

    valid = lab >= 0
    prev_label = (sv & 0x0FFFFFFF) - 1
    prev_vrb = sv >> 28
    fresh = lab != prev_label
    matched = valid & ~fresh & ((pk >> 31) > 0)

    if rhat_packed:
        prx, pry, prz = _oct_decode_kernel(rh)
    else:
        prx, pry, prz = rh
    cosang = jnp.clip(
        prx * rhat[0] + pry * rhat[1] + prz * rhat[2], -1.0, 1.0
    )
    dtheta = jnp.where(matched, _acos_f32(cosang), 0.0)
    pang = pltpu.bitcast(pk & jnp.uint32(0x7FFFFFFF), jnp.float32)
    if pericentric:
        flip = ((prev_vrb & 1) > 0) & ((vrb & 2) > 0)
    else:
        flip = ((prev_vrb & 2) > 0) & ((vrb & 1) > 0)
    apsis = matched & flip
    angle_acc = jnp.where(matched, pang + dtheta, 0.0)
    opk = pltpu.bitcast(
        jnp.where(apsis | ~valid, 0.0, angle_acc), jnp.uint32
    ) | (valid.astype(jnp.uint32) << 31)

    if pos_iota is None:
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 1)
    ang15 = f16_bits_rne(angle_acc) & jnp.uint32(0x7FFF)
    payload = jnp.where(
        apsis, ((pos_iota + 1).astype(jnp.uint32) << 15) | ang15,
        jnp.uint32(0),
    )
    osv = jnp.where(valid, (lab + 1) | (vrb << 28), jnp.int32(0))
    if rhat_packed:
        orh = _oct_encode_kernel(rhat[0], rhat[1], rhat[2])
    else:
        orh = tuple(rhat)
    return osv, orh, opk, payload, apsis


def _fused_label_kernel(pericentric, box_size, h, rhat_packed, w, rb,
                        tab_ref, lab_ref, pos_ref, vel_ref,
                        sv_ref, rh_ref, pk_ref, hub_ref,
                        osv_ref, orh_ref, opk_ref, opay_ref, ocnt_ref):
    lab = lab_ref[:]                                    # [rb, W] i32
    # frame rows: one exact bf16x3 one-hot MXU dot PER SUBLANE ROW
    # (the dot needs particles on its lane axis, so an [rb, W] block
    # takes rb narrow dots — same total MXU work as one wide dot —
    # and the outputs re-stack on sublanes so every elementwise op
    # downstream runs on full (8, 128) vregs)
    rows = []                                           # rb x [6, W]
    for r in range(rb):
        onehot = (
            jnp.broadcast_to(lab[r:r + 1], (h, w))
            == jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        )
        out3 = jax.lax.dot_general(
            tab_ref[:], onehot.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [18, W]
        rows.append((out3[:6] + out3[6:12]) + out3[12:])

    def row(c):                                         # [rb, W] f32
        return jnp.concatenate(
            [rows[r][c:c + 1] for r in range(rb)], axis=0
        )

    p3 = pos_ref[:]                                     # [3, rb, W]
    v3 = vel_ref[:]
    if rhat_packed:
        rh = rh_ref[:]                                  # [rb, W]
    else:
        prh = rh_ref[:]                                 # [3, rb, W]
        rh = (prh[0], prh[1], prh[2])
    osv, orh, opk, payload, apsis = _detect_core(
        pericentric, box_size, rhat_packed, lab,
        tuple(p3[d] for d in range(3)),
        tuple(v3[d] for d in range(3)),
        tuple(row(d) for d in range(3)),
        tuple(row(3 + d) for d in range(3)),
        sv_ref[:], rh, pk_ref[:], hub_ref[0, 0],
    )
    opk_ref[:] = opk
    opay_ref[:] = payload
    ocnt_ref[:] = jnp.sum(apsis.astype(jnp.int32), axis=1,
                          keepdims=True)
    osv_ref[:] = osv
    if rhat_packed:
        orh_ref[:] = orh
    else:
        orh_ref[:] = jnp.stack(orh, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "pericentric", "box_size", "rhat_packed", "interpret", "rb"))
def _fused_label_call(pericentric, box_size, rhat_packed, interpret,
                      rb, tab_cat, lab, pos, vel, sv, rh, pk, hub):
    h = tab_cat.shape[1]
    r, w = lab.shape
    spec1 = pl.BlockSpec((rb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((3, rb, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec_rh = spec1 if rhat_packed else spec3
    rh_shape = (
        jax.ShapeDtypeStruct((r, w), jnp.uint32) if rhat_packed
        else jax.ShapeDtypeStruct((3, r, w), jnp.float32)
    )
    return pl.pallas_call(
        functools.partial(
            _fused_label_kernel, pericentric, box_size, h,
            rhat_packed, w, rb,
        ),
        grid=(r // rb,),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.int32),    # sv'
            rh_shape,                                   # rhat'
            jax.ShapeDtypeStruct((r, w), jnp.uint32),   # packed'
            jax.ShapeDtypeStruct((r, w), jnp.uint32),   # payload
            jax.ShapeDtypeStruct((r, 1), jnp.int32),    # count
        ),
        in_specs=[
            pl.BlockSpec((18, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # tab_cat
            spec1,                                      # lab
            spec3,                                      # pos
            spec3,                                      # vel
            spec1,                                      # sv
            spec_rh,                                    # rhat
            spec1,                                      # packed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # hubble
        ],
        out_specs=(
            spec1, spec_rh, spec1, spec1,
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # count
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(tab_cat, lab, pos, vel, sv, rh, pk, hub)


#: sublane rows per fused grid step (full-vreg elementwise work; the
#: frame dots run one narrow MXU pass per row)
_FUSED_RB = 8


def fused_label_detect(table, lab, pos, vel, sv, rhat, packed,
                       hubble_drag, *, pericentric, box_size,
                       rhat_packed=False, interpret=None):
    """Run the fused label-native detection pass.

    ``table``: ``[H, 6]`` f32 (centers ++ bulk); ``lab``: ``[R, W]``
    int32 in ``[-1, H)``; ``pos``/``vel``: ``[3, R, W]`` f32;
    ``sv``/``packed``: the :class:`~.label_step.LabelCarry` planes;
    ``rhat``: ``[3, R, W]`` f32 or ``[R, W]`` uint32
    (``rhat_packed``).  Returns ``(sv', rhat', packed', payload
    [R, W] u32, count [R] i32)`` — feed ``payload`` to
    :func:`~.pallas_compact.compact_payload_blocked`.
    """
    if interpret is None:
        interpret = default_interpret()
    h = table.shape[0]
    r, w = lab.shape
    if h * w * 2 > _MAX_ONEHOT_BYTES:
        raise ValueError(
            f"one-hot block [{h}, {w}] exceeds the fused kernel's VMEM "
            "budget; use frames='twolevel'"
        )
    rb = _FUSED_RB
    while r % rb:
        rb //= 2
    tab_cat = jnp.concatenate(
        _split3(jnp.asarray(table, jnp.float32).T), axis=0
    )                                                    # [18, H]
    hub = jnp.asarray(hubble_drag, jnp.float32).reshape(1, 1)
    sv_n, rh_n, pk_n, payload, count = _fused_label_call(
        pericentric, box_size, rhat_packed, interpret, rb,
        tab_cat, lab, pos, vel, sv, rhat, packed, hub,
    )
    return sv_n, rh_n, pk_n, payload, count.reshape(r)


def _detect_label_kernel(pericentric, box_size, rhat_packed,
                         rows_ref, lab_ref, pos_ref, vel_ref,
                         sv_ref, rh_ref, pk_ref, hub_ref,
                         osv_ref, orh_ref, opk_ref, opay_ref, ocnt_ref):
    rows = rows_ref[:]                                  # [6, rb, W]
    if rhat_packed:
        rh = rh_ref[:]                                  # [rb, W]
    else:
        prh = rh_ref[:]                                 # [3, rb, W]
        rh = (prh[0], prh[1], prh[2])
    osv, orh, opk, payload, apsis = _detect_core(
        pericentric, box_size, rhat_packed, lab_ref[:],
        tuple(pos_ref[d] for d in range(3)),
        tuple(vel_ref[d] for d in range(3)),
        tuple(rows[d] for d in range(3)),
        tuple(rows[3 + d] for d in range(3)),
        sv_ref[:], rh, pk_ref[:], hub_ref[0, 0],
    )
    opk_ref[:] = opk
    opay_ref[:] = payload
    ocnt_ref[:] = jnp.sum(apsis.astype(jnp.int32), axis=1,
                          keepdims=True)
    osv_ref[:] = osv
    if rhat_packed:
        orh_ref[:] = orh
    else:
        orh_ref[:] = jnp.stack(orh, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "pericentric", "box_size", "rhat_packed", "interpret", "rb"))
def _detect_label_call(pericentric, box_size, rhat_packed, interpret,
                       rb, rows, lab, pos, vel, sv, rh, pk, hub):
    r, w = lab.shape
    spec1 = pl.BlockSpec((rb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((3, rb, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec_rh = spec1 if rhat_packed else spec3
    rh_shape = (
        jax.ShapeDtypeStruct((r, w), jnp.uint32) if rhat_packed
        else jax.ShapeDtypeStruct((3, r, w), jnp.float32)
    )
    return pl.pallas_call(
        functools.partial(
            _detect_label_kernel, pericentric, box_size, rhat_packed,
        ),
        grid=(r // rb,),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.int32),    # sv'
            rh_shape,                                   # rhat'
            jax.ShapeDtypeStruct((r, w), jnp.uint32),   # packed'
            jax.ShapeDtypeStruct((r, w), jnp.uint32),   # payload
            jax.ShapeDtypeStruct((r, 1), jnp.int32),    # count
        ),
        in_specs=[
            pl.BlockSpec((6, rb, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),      # frame rows
            spec1,                                      # lab
            spec3,                                      # pos
            spec3,                                      # vel
            spec1,                                      # sv
            spec_rh,                                    # rhat
            spec1,                                      # packed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # hubble
        ],
        out_specs=(
            spec1, spec_rh, spec1, spec1,
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rows, lab, pos, vel, sv, rh, pk, hub)


#: sublane rows per detect grid step: full (8, 128) vreg occupancy for
#: every elementwise op, VMEM-bounded at wide rows (~18 MB of input
#: blocks at rb=8, W=2**15)
_DETECT_RB = 8


def detect_label_pallas(rows, lab, pos, vel, sv, rhat, packed,
                        hubble_drag, *, pericentric, box_size,
                        rhat_packed=False, interpret=None):
    """The label-native detect chain (geometry + apsis + carry +
    payload) as ONE full-vreg Pallas pass over ``[rb, W]`` tiles.

    Splits the fused kernel differently: the frame rows come in
    precomputed (``pallas_frames.frame_rows_bf16x3`` — already a
    VMEM-blocked one-hot MXU pass), and everything elementwise runs on
    8-sublane 2D tiles at full (8, 128) vreg occupancy — unlike the
    single-pass fused kernel, whose per-row ``[1, W]`` strips leave
    7/8 of every VPU lane group idle (measured: full step 19.7 vs
    15.6 ms/scan at the bench shape).

    ``rows``: ``[6, R, W]`` f32 (centers ++ bulk, SoA); everything
    else as :func:`fused_label_detect`.  Returns the same tuple.
    """
    if interpret is None:
        interpret = default_interpret()
    r, w = lab.shape
    rb = _DETECT_RB
    while r % rb:
        rb //= 2
    hub = jnp.asarray(hubble_drag, jnp.float32).reshape(1, 1)
    sv_n, rh_n, pk_n, payload, count = _detect_label_call(
        pericentric, box_size, rhat_packed, interpret, rb,
        rows, lab, pos, vel, sv, rhat, packed, hub,
    )
    return sv_n, rh_n, pk_n, payload, count.reshape(r)


def _detect_label_compact_kernel(pericentric, box_size, rhat_packed,
                                 rpb, b, kr,
                                 rows_ref, lab_ref, pos_ref, vel_ref,
                                 sv_ref, rh_ref, pk_ref, hub_ref,
                                 osv_ref, orh_ref, opk_ref, opay_ref,
                                 oev_ref, ocnt_ref, oov_ref):
    """Detect + per-row blocked compaction in ONE kernel over
    lane-major ``[B2, 128]`` tiles (``B2 = rb * rpb`` kernel rows =
    ``rb`` compaction rows of ``rpb = row_width // 128`` blocks).
    The event payload never leaves VMEM in the fast path — the
    separate compaction kernel's launch + payload read disappear
    (round-5: the [R, W] payload round-trip and kernel boundary cost
    ~0.1-0.2 ms/snapshot of the label step at the bench shape)."""
    from orbitanalysis_tpu.ops.pallas_compact import (
        _blocked_compact_rows,
    )

    lab = lab_ref[:]                                    # [B2, 128]
    b2 = lab.shape[0]
    rows = rows_ref[:]                                  # [6, B2, 128]
    if rhat_packed:
        rh = rh_ref[:]
    else:
        prh = rh_ref[:]
        rh = (prh[0], prh[1], prh[2])
    # element position within its compaction row: (kernel row % rpb)
    # blocks of 128 lanes
    rowi = jax.lax.broadcasted_iota(jnp.int32, (b2, _TILE_LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b2, _TILE_LANES), 1)
    pos_iota = (rowi % rpb) * _TILE_LANES + lane
    osv, orh, opk, payload, apsis = _detect_core(
        pericentric, box_size, rhat_packed, lab,
        tuple(pos_ref[d] for d in range(3)),
        tuple(vel_ref[d] for d in range(3)),
        tuple(rows[d] for d in range(3)),
        tuple(rows[3 + d] for d in range(3)),
        sv_ref[:], rh, pk_ref[:], hub_ref[0, 0],
        pos_iota=pos_iota,
    )
    opk_ref[:] = opk
    opay_ref[:] = payload
    osv_ref[:] = osv
    if rhat_packed:
        orh_ref[:] = orh
    else:
        orh_ref[:] = jnp.stack(orh, axis=0)
    seli = apsis.astype(jnp.int32)
    rb = b2 // rpb
    for j in range(rb):
        sl = slice(j * rpb, (j + 1) * rpb)
        out, ov = _blocked_compact_rows(
            payload[sl], seli[sl], b, kr)
        oev_ref[j] = out
        # 2D-shaped stores: Mosaic cannot store scalars to VMEM
        ocnt_ref[j:j + 1, 0:1] = jnp.sum(seli[sl]).reshape(1, 1)
        oov_ref[j:j + 1, 0:1] = ov.reshape(1, 1)


_TILE_LANES = 128
#: compaction rows per grid step of the detect+compact kernel (VMEM:
#: ~22 MB of blocks at row_width 2**15)
_DC_RB = 8


@functools.partial(jax.jit, static_argnames=(
    "pericentric", "box_size", "rhat_packed", "interpret", "rb",
    "rpb", "b", "k128"))
def _detect_label_compact_call(pericentric, box_size, rhat_packed,
                               interpret, rb, rpb, b, k128,
                               rows, lab, pos, vel, sv, rh, pk, hub):
    r2 = lab.shape[0]                   # total kernel rows = R * rpb
    R = r2 // rpb
    kr = k128 // _TILE_LANES
    b2 = rb * rpb
    spec1 = pl.BlockSpec((b2, _TILE_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((3, b2, _TILE_LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec6 = pl.BlockSpec((6, b2, _TILE_LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec_rh = spec1 if rhat_packed else spec3
    rh_shape = (
        jax.ShapeDtypeStruct((r2, _TILE_LANES), jnp.uint32)
        if rhat_packed
        else jax.ShapeDtypeStruct((3, r2, _TILE_LANES), jnp.float32)
    )
    return pl.pallas_call(
        functools.partial(
            _detect_label_compact_kernel, pericentric, box_size,
            rhat_packed, rpb, b, kr,
        ),
        grid=(R // rb,),
        out_shape=(
            jax.ShapeDtypeStruct((r2, _TILE_LANES), jnp.int32),   # sv'
            rh_shape,                                             # rhat'
            jax.ShapeDtypeStruct((r2, _TILE_LANES), jnp.uint32),  # pk'
            jax.ShapeDtypeStruct((r2, _TILE_LANES), jnp.uint32),  # payload
            jax.ShapeDtypeStruct((R, kr, _TILE_LANES), jnp.uint32),  # ev
            jax.ShapeDtypeStruct((R, 1), jnp.int32),              # count
            jax.ShapeDtypeStruct((R, 1), jnp.int32),              # ov
        ),
        in_specs=[
            spec6,                                      # frame rows
            spec1,                                      # lab
            spec3,                                      # pos
            spec3,                                      # vel
            spec1,                                      # sv
            spec_rh,                                    # rhat
            spec1,                                      # packed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # hubble
        ],
        out_specs=(
            spec1, spec_rh, spec1, spec1,
            pl.BlockSpec((rb, kr, _TILE_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rows, lab, pos, vel, sv, rh, pk, hub)


def detect_label_compact_pallas(rows, lab, pos, vel, sv, rhat, packed,
                                hubble_drag, *, event_capacity,
                                pericentric, box_size,
                                rhat_packed=False, block_cap=16,
                                interpret=None):
    """The label-native detect chain PLUS per-row blocked event
    compaction as one Pallas pass (see
    :func:`_detect_label_compact_kernel`).

    Same input contract as :func:`detect_label_pallas` ([R, W]
    planes; everything is reshaped to lane-major [R*W/128, 128] tiles
    internally — a layout-free reshape).  Returns ``(sv', rhat',
    packed', payload [R, W], evpay [R, k128], count [R], ov [R])``;
    ``ov[r] > block_cap`` means row ``r``'s fast-path compaction
    overflowed and ``evpay`` must be recomputed from ``payload`` via
    the exact full-range network (callers wrap in ``lax.cond`` —
    :func:`orbitanalysis_tpu.ops.label_step.make_label_orbit_step`).
    """
    if interpret is None:
        interpret = default_interpret()
    r, w = lab.shape
    if w % _TILE_LANES:
        raise ValueError("row_width must be a multiple of 128")
    rpb = w // _TILE_LANES
    k128 = min(
        ((event_capacity + _TILE_LANES - 1) // _TILE_LANES)
        * _TILE_LANES, w,
    )
    rb = _DC_RB
    while r % rb:
        rb //= 2
    r2 = r * rpb

    def flat(x):
        return x.reshape(x.shape[:-2] + (r2, _TILE_LANES))

    hub = jnp.asarray(hubble_drag, jnp.float32).reshape(1, 1)
    osv, orh, opk, opay, oev, ocnt, oov = _detect_label_compact_call(
        pericentric, box_size, rhat_packed, interpret, rb, rpb,
        block_cap, k128,
        flat(rows), flat(lab), flat(pos), flat(vel), flat(sv),
        flat(rhat), flat(packed), hub,
    )

    def unflat(x):
        return x.reshape(x.shape[:-2] + (r, w))

    return (unflat(osv), unflat(orh), unflat(opk), unflat(opay),
            oev.reshape(r, k128), ocnt.reshape(r), oov.reshape(r))
