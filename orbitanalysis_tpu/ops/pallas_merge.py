"""VMEM-resident bitonic merge of presorted rows (Pallas TPU kernel).

The sorted-carry orbit step (:mod:`orbitanalysis_tpu.ops.sorted_step`)
joins two ID-sorted rows per halo.  ``jax.lax.sort`` on the ``[H, 2P]``
concatenation redoes the full ``O(n log^2 n)`` sorting network even
though both halves are already sorted; merging them needs only the
final ``log2(2P)`` bitonic *merge* stages.  A jnp-level merge measured
slower than ``lax.sort`` (each stage round-trips HBM; see README
"Roadmap"), so the stages run here inside one Pallas kernel with every
channel VMEM-resident: one HBM read and one write per channel total.

Layout: rows are viewed as ``[R, 128]`` blocks (lane dimension filled).
A compare-exchange at distance ``k`` is two circular rolls plus
selects; rolls decompose into sublane rolls (``k`` a multiple of 128)
or a lane roll + row-shifted lane roll + column select (``k < 128``).
The wrap-around values a circular roll drags across the array boundary
are never selected: bitonic pairs ``(i, i+k)`` stay inside aligned
``2k`` blocks.

Keys must be uint32 and unique within each row (the orbit step packs
``id << 1 | side``, and particle IDs are unique per region —
``/root/reference/orbitanalysis/utils.py:4-11`` relies on the same).
Payload channels may be any 32-bit dtype.  The *first* input row must
be ascending, the *second* descending (their concatenation is then
bitonic); ``sort_descending_u32`` builds the descending half for free
by sorting bit-complemented keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orbitanalysis_tpu.ops.pallas_config import default_interpret
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _roll_rows(x, m):
    """Circular roll of the leading (row) axis by ``m`` (may be negative)."""
    r = x.shape[0]
    m %= r
    if m == 0:
        return x
    return pltpu.roll(x, m, axis=0)


def _roll_flat(x, k):
    """Circular roll of the flattened ``[R, 128]`` array by ``k`` elements:
    ``out[i] = flat[(i - k) mod N]`` (``k > 0`` moves values forward)."""
    m, rem = divmod(-k % (x.shape[0] * _LANES), _LANES)
    if rem == 0:
        return _roll_rows(x, -m)
    a = pltpu.roll(_roll_rows(x, -m), _LANES - rem, axis=1)
    b = pltpu.roll(_roll_rows(x, -(m + 1)), _LANES - rem, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < _LANES - rem, a, b)


def _cmpx_blocks(chans, kr, rows, lanes):
    """Compare-exchange at *row* distance ``kr`` via static row-block
    slicing — no rotations: pairs are rows ``[m, 0, kr, :]`` vs
    ``[m, 1, kr, :]`` of the ``[m, 2, kr, lanes]`` view."""
    out, _ = _cmpx_blocks_rec(chans, None, 0, kr, rows, lanes)
    return out


def _cmpx_blocks_rec(chans, bits, j, kr, rows, lanes):
    """:func:`_cmpx_blocks`, optionally recording the swap decision as
    bit ``j`` of the positional ``bits`` plane (written at both pair
    positions; pass ``bits=None`` to skip recording).

    The bits plane is *positional* — it is never permuted by the merge —
    so the recorded network can later be replayed in reverse to route
    per-element results back to their source positions
    (:func:`_uncmpx_blocks`), replacing a full log-shift compaction."""
    m = rows // (2 * kr)
    views = [c.reshape(m, 2, kr, lanes) for c in chans]
    a = [v[:, 0] for v in views]
    b = [v[:, 1] for v in views]
    cond = a[0] <= b[0]
    if bits is not None:
        sw = jnp.where(cond, jnp.uint32(0), jnp.uint32(1) << j)
        bits = bits | jnp.concatenate(
            [sw[:, None], sw[:, None]], axis=1
        ).reshape(rows, lanes)
    out = []
    for av, bv in zip(a, b):
        lo = jnp.where(cond, av, bv)
        hi = jnp.where(cond, bv, av)
        out.append(
            jnp.concatenate(
                [lo[:, None], hi[:, None]], axis=1
            ).reshape(rows, lanes)
        )
    return out, bits


def _uncmpx_blocks(chans, bits, j, kr, rows, lanes):
    """Invert one recorded compare-exchange stage: swap back the pairs
    whose bit ``j`` is set."""
    m = rows // (2 * kr)
    bview = bits.reshape(m, 2, kr, lanes)
    swapped = ((bview[:, 0] >> j) & 1) == 1
    out = []
    for c in chans:
        v = c.reshape(m, 2, kr, lanes)
        a, b = v[:, 0], v[:, 1]
        na = jnp.where(swapped, b, a)
        nb = jnp.where(swapped, a, b)
        out.append(
            jnp.concatenate(
                [na[:, None], nb[:, None]], axis=1
            ).reshape(rows, lanes)
        )
    return out


def _merge_kernel(n_payload, n2, *refs):
    """One halo row: bitonic-merge prev (asc) + cur (desc) halves.

    Stages with pair distance >= 128 are pure row-block exchanges; the
    remaining lane-local stages run on a transposed copy so they are
    row-block exchanges too (one transpose each way per channel instead
    of 2*log2(128) lane rotations per channel).
    """
    nchan = 1 + n_payload
    in_prev = refs[:nchan]
    in_cur = refs[nchan:2 * nchan]
    out = refs[2 * nchan:]

    # concat halves into [2R, 128] working arrays
    chans = [
        jnp.concatenate([p[0], c[0]], axis=0)
        for p, c in zip(in_prev, in_cur)
    ]
    rows2 = n2 // _LANES

    k = n2 // 2
    while k >= _LANES:
        chans = _cmpx_blocks(chans, k // _LANES, rows2, _LANES)
        k //= 2

    if k >= 1:
        # remaining stages are within 128-element blocks = lane-local;
        # transpose so they become sublane(row)-local block exchanges
        chans = [c.T for c in chans]
        while k >= 1:
            chans = _cmpx_blocks(chans, k, _LANES, rows2)
            k //= 2
        chans = [c.T for c in chans]

    for o, ch in zip(out, chans):
        o[0] = ch


@functools.partial(jax.jit, static_argnames=("n_payload", "interpret"))
def _merge_call(n_payload, interpret, *arrays):
    h, r, _ = arrays[0].shape
    n2 = 2 * r * _LANES
    nchan = 1 + n_payload
    out_shapes = tuple(
        jax.ShapeDtypeStruct((h, 2 * r, _LANES), a.dtype)
        for a in arrays[:nchan]
    )
    spec_in = pl.BlockSpec(
        (1, r, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_out = pl.BlockSpec(
        (1, 2 * r, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_merge_kernel, n_payload, n2),
        grid=(h,),
        out_shape=out_shapes,
        in_specs=[spec_in] * (2 * nchan),
        out_specs=(spec_out,) * nchan,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # v5e has far more physical VMEM than the 16 MiB default
            # scoped limit; whole merged rows live on-chip
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*arrays)


def merge_rows(prev_ops, cur_ops, num_keys: int = 1):
    """Merge per-row presorted operand tuples into ``[H, 2P]`` sorted rows.

    ``prev_ops`` / ``cur_ops``: tuples ``(key, *payloads)`` of ``[H, P]``
    arrays; ``key`` is uint32, ascending in ``prev_ops`` rows and
    **descending** in ``cur_ops`` rows, unique within each merged row.
    Payload dtypes must be 32-bit and match between the tuples.  Returns
    the merged ``(key, *payloads)`` with key ascending — the same
    contract as ``jax.lax.sort`` on the concatenation (stability is
    moot: keys are unique).
    """
    if num_keys != 1:
        raise NotImplementedError(
            "pallas merge supports a single packed uint32 key; use "
            "merge_impl='lax_sort' for 64-bit particle IDs"
        )
    if len(prev_ops) != len(cur_ops):
        raise ValueError("prev/cur operand count mismatch")
    if prev_ops[0].dtype != jnp.uint32:
        raise TypeError("merge key must be uint32")
    h, p = prev_ops[0].shape
    if p % _LANES or (p & (p - 1)):
        raise ValueError(
            f"row length must be a power of two >= {_LANES} (bitonic "
            f"merge network); got {p} — pad with round_up_pow2"
        )
    for a, b in zip(prev_ops, cur_ops):
        if a.shape != (h, p) or b.shape != (h, p):
            raise ValueError("all operands must be [H, P]")
        if a.dtype != b.dtype or a.dtype.itemsize != 4:
            raise TypeError("payloads must be matching 32-bit dtypes")

    r = p // _LANES
    arrays = tuple(a.reshape(h, r, _LANES) for a in prev_ops) + tuple(
        a.reshape(h, r, _LANES) for a in cur_ops
    )
    # kernel expects prev channels then cur channels; interpret mode off
    # TPU (CPU test tier, same convention as ops/pallas_nbody.py)
    interpret = default_interpret()
    out = _merge_call(len(prev_ops) - 1, interpret, *arrays)
    return tuple(o.reshape(h, 2 * p) for o in out)


def sort_descending_u32(key, *payloads):
    """Row-sort by uint32 key descending (payloads ride), via one
    ascending ``lax.sort`` of the complemented key."""
    out = jax.lax.sort((~key,) + payloads, dimension=-1, num_keys=1)
    return (~out[0],) + out[1:]
