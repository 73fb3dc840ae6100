"""Label-native orbit detection over a position-stable particle pool.

Device-resident pipelines — the native integrator
(:mod:`orbitanalysis_tpu.models.nbody`) and the hash-sharded record
pools (:mod:`orbitanalysis_tpu.parallel.hash_sharded`) — hold their
particles in a GLOBAL array whose positions never change: position i
is particle i for the whole run.  That array is a stable layout by
construction, so the aligned engine's central trick (detection needs
layout stability, not ID identity — ``ops/sorted_step.py``) applies
with no staging at all: membership churn against halo regions is just
a per-particle halo *label* change, and the whole reference detection
semantics (``/root/reference/orbitanalysis/track_orbits.py:293-351``:
entered/departed handling, radial-velocity sign flips, angle
accumulate/reset) becomes elementwise over ``[N]`` planes:

- entered  (reference ``setdiff1d`` bookkeeping, ``:300-309``)
    = ``label != prev_label`` — the FRESH condition, elementwise;
- departed = the same comparison seen from the previous label;
- the ID join disappears — there is nothing to match because nothing
  moves.

The one non-elementwise need — per-particle halo center / bulk
velocity — is a tiny-table gather, which TPUs hate (measured 10-30 ns
*per index* through XLA's gather engine; the round-2 integrator paid
711 ms/step for its member gathers at 12.6M particles).  Here it runs
as a ONE-HOT MATMUL on the MXU: ``onehot(label) [N, H] @ table [H, C]``
chunked to bound the one-hot materialization.  One-hot selection in
f32 is exact (each output row sums exactly one table row), so frame
math is bit-identical to a gather.

Per-halo bulk velocities (the reference's mass-weighted moving-center
frame, ``track_orbits.py:267-284``) ride the SAME chunked one-hot:
``onehot^T [H, chunk] @ moments [chunk, 4]`` accumulated across
chunks — two MXU passes per step, zero gathers, zero sorts.

Events come back positional (the aligned engine's single-payload
contract, ``ops/pallas_compact.py:compact_payload``): the global pool
index identifies the particle, and the label plane maps it to a halo.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "LabelCarry",
    "LabelEvents",
    "assign_regions",
    "init_label_carry",
    "make_label_orbit_step",
    "scan_label_events",
    "take_rows_matmul",
]


class LabelCarry(NamedTuple):
    """Per-particle detector state over the global pool (all ``[N]``
    planes; ``rhat`` is ``[3, N]``).

    ``lab_sv``: previous halo label in bits 0-27 offset by +1 (0 =
    untracked; labels are < 2**27) with the radial-velocity sign bits
    in bits 28-29 (bit 28 = inward, bit 29 = outward, the
    :func:`orbitanalysis_tpu.ops.sorted_step._vr_bits` convention
    shifted) — one i32 plane instead of an i32 + a sub-word u8 (TPU
    elementwise on u8 planes pays relayouts).  ``packed``: f32 angle
    accumulator in bits 0-30, matched flag in bit 31 — the aligned
    engine's carry contract.
    """

    lab_sv: jnp.ndarray  # [N] int32: (label + 1) | vrb << 28
    rhat: jnp.ndarray    # [3, N] f32, or [N] uint32 octahedral-packed
    packed: jnp.ndarray  # [N] uint32


class LabelEvents(NamedTuple):
    """Positional events per compaction row (see
    :func:`make_label_orbit_step` for the row geometry): ``count[r]``
    events in row ``r``, front-packed global pool indices and
    f16-quantized angles; entries past the count are invalid/-0."""

    count: jnp.ndarray   # [R] int32
    index: jnp.ndarray   # [R, K] int32 global pool index (invalid: -1)
    angle: jnp.ndarray   # [R, K] float32 (f16-exact)
    bulk_vel: jnp.ndarray  # [H, 3] the frame bulk velocities used


def init_label_carry(n: int, rhat_packed: bool = False) -> LabelCarry:
    """All-untracked carry.  ``rhat_packed=True`` stores the radial
    unit vectors octahedral-compressed (uint32 instead of 3 x f32: the
    carry drops from 20 to 12 B/particle — the 1e8-particles-per-chip
    diet).  Counts are unaffected by construction (radial-velocity
    signs never read the carried rhat); accumulated angles move by the
    ~1e-4 rad quantization per step."""
    return LabelCarry(
        lab_sv=jnp.zeros((n,), jnp.int32),  # label -1, no sign bits
        rhat=(jnp.zeros((n,), jnp.uint32) if rhat_packed
              else jnp.zeros((3, n), jnp.float32)),
        packed=jnp.zeros((n,), jnp.uint32),
    )


def _auto_chunk(n: int, h: int, chunk) -> int:
    """Single-chunk when the implied one-hot stays under ~1 GB: without
    a ``lax.map``/``scan`` boundary XLA fuses the iota-compare into the
    MXU operand feed and the dot output into its consumers (measured
    ~20% faster than 128k chunks at 2M x 64); chunk only to bound
    worst-case transient memory."""
    if chunk is None:
        chunk = n if n * h * 4 <= (1 << 30) else 1 << 17
    if n % chunk:
        chunk = n  # odd sizes: single chunk (still bounded by caller)
    return chunk


def take_rows_matmul(table: jnp.ndarray, idx: jnp.ndarray,
                     chunk=None) -> jnp.ndarray:
    """``table[idx]`` for a small table, as (optionally chunked)
    one-hot matmuls.

    ``table``: ``[H, C]`` f32; ``idx``: ``[N]`` int32 in ``[-1, H)``
    (-1 rows return zeros).  Exact in f32: each output row is a sum
    with exactly one nonzero product.  MXU-bound at ``2 N H C`` flops
    instead of ``N`` serial gather lookups (10-30 ns each on TPU).
    """
    h, c = table.shape
    n = idx.shape[0]
    chunk = _auto_chunk(n, h, chunk)

    def body(ix):
        onehot = (ix[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :])
        return jnp.dot(onehot.astype(table.dtype), table,
                       precision=jax.lax.Precision.HIGHEST)

    if n == chunk:
        return body(idx)
    out = jax.lax.map(body, idx.reshape(n // chunk, chunk))
    return out.reshape(n, c)


def take_rows_select(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` via a ``lax.scan`` of per-row selects — exact
    (no matmul rounding), O(H) elementwise passes over ``[N]``: the
    bit-exact alternative to :func:`take_rows_matmul` for small ``H``.
    """
    h, c = table.shape
    n = idx.shape[0]

    def body(carry, hrow):
        out, h_idx = carry
        row, = hrow
        out = jnp.where((idx == h_idx)[:, None], row[None, :], out)
        return (out, h_idx + 1), None

    (out, _), _ = jax.lax.scan(
        body, (jnp.zeros((n, c), table.dtype), jnp.int32(0)), (table,)
    )
    return out


def _segment_moments_matmul(values: jnp.ndarray, idx: jnp.ndarray,
                            n_halos: int,
                            chunk=None) -> jnp.ndarray:
    """Per-halo sums of ``values [N, C]`` grouped by ``idx [N]``
    (-1 ignored), as chunked ``onehot^T @ values`` MXU passes.

    f32 accumulation in halo-major chunk order — deterministic, and
    within one ulp of a NumPy segment sum (the aligned engine's
    bulk-velocity tolerance class, ``tests/test_engine.py``).
    """
    h = n_halos
    n, c = values.shape
    chunk = _auto_chunk(n, h, chunk)

    def body(acc, xs):
        ix, val = xs
        onehot = (ix[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :])
        return acc + jnp.dot(onehot.astype(values.dtype).T, val,
                             precision=jax.lax.Precision.HIGHEST), None

    if n == chunk:
        onehot = (idx[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :])
        return jnp.dot(onehot.astype(values.dtype).T, values,
                       precision=jax.lax.Precision.HIGHEST)
    acc, _ = jax.lax.scan(
        body, jnp.zeros((h, c), values.dtype),
        (idx.reshape(n // chunk, chunk),
         values.reshape(n // chunk, chunk, c)),
    )
    return acc


def assign_regions(pos, centers, radii, box_size=None,
                   soa: bool = False) -> jnp.ndarray:
    """Halo label per particle: index of the nearest center whose
    region (periodic-wrapped distance < radius) contains it, else -1.

    The reference selects region members by brute-force radius test per
    halo (``/root/reference/example_script.py:50-58``); this is the
    same predicate resolved to a single owner (nearest center wins on
    overlap), streamed over the halo axis so nothing ``[N, H]``-sized
    materializes.
    """
    pos = jnp.asarray(pos)
    x = pos if soa else jnp.moveaxis(pos, -1, 0)  # [3, N]
    n = x.shape[1]
    centers = jnp.asarray(centers, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)

    def body(carry, hc):
        best_d2, best_h, h_idx = carry
        c, r = hc
        d = x - c[:, None]
        if box_size is not None:
            d = d - box_size * jnp.round(d / box_size)
        d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        hit = (d2 < r * r) & (d2 < best_d2)
        return (
            jnp.where(hit, d2, best_d2),
            jnp.where(hit, h_idx, best_h),
            h_idx + 1,
        ), None

    (_, label, _), _ = jax.lax.scan(
        body,
        (jnp.full((n,), jnp.inf, jnp.float32),
         jnp.full((n,), -1, jnp.int32), jnp.int32(0)),
        (centers, radii),
    )
    return label


def make_label_orbit_step(
    event_capacity: int,
    mode: str = "pericentric",
    box_size=None,
    n_halos: Optional[int] = None,
    chunk=None,
    row_width: int = 1 << 15,
    frames: str = "matmul",
    rhat_packed: bool = False,
):
    """Churn-proof detector over a position-stable pool — the aligned
    engine's step with the stable layout provided by the pool itself
    (no staging, no join): everything is elementwise ``[N]`` planes
    except two chunked one-hot MXU passes for the halo frames.

    The returned ``step(carry, inputs) -> (carry, LabelEvents)`` takes
    ``inputs = (pos [3, N], vel [3, N], label [N], centers [H, 3],
    bulk_vel [H, 3] or None, mass [N] or None, hubble_drag scalar)``.
    Apsis semantics are the reference's (sign flip between consecutive
    steps while the particle stays in the same halo's region; a label
    change is region entry: state restarts like
    ``track_orbits.py:300-309``'s entered set).

    Events are positional over compaction rows of ``row_width``
    entries (``N`` must be a multiple; the single-payload encoding
    addresses ``pos + 1 <= 2**17 - 1`` per row): global pool index =
    ``row * row_width + position``.  ``event_capacity`` is per row.
    """
    from orbitanalysis_tpu.ops.pallas_compact import compact_payload
    from orbitanalysis_tpu.ops.pallas_step import _acos_f32
    from orbitanalysis_tpu.utils.numerics import oct_decode, oct_encode

    if mode not in ("pericentric", "apocentric"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    pericentric = mode == "pericentric"
    K = int(event_capacity)
    if row_width > (1 << 17) - 128:
        raise ValueError("row_width exceeds the positional payload budget")

    def step(carry: LabelCarry, inputs):
        pos, vel, label, centers, bulk_vel, mass, hubble_drag = inputs
        n = label.shape[0]
        if n % row_width:
            raise ValueError(
                f"pool size {n} must be a multiple of row_width "
                f"{row_width}"
            )
        h = centers.shape[0] if n_halos is None else n_halos
        valid = label >= 0

        # halo frames via one MXU pass: moments [H, 8] = [m·vx, m·vy,
        # m·vz, m] (+ zeros padding); bulk = m·v sums / m sum
        if bulk_vel is None:
            w = jnp.ones((n,), jnp.float32) if mass is None else mass
            w = jnp.where(valid, w, 0.0)
            mom = _segment_moments_matmul(
                jnp.stack([vel[0] * w, vel[1] * w, vel[2] * w, w],
                          axis=-1),
                jnp.where(valid, label, -1), h, chunk=chunk,
            )
            bulk = mom[:, :3] / jnp.maximum(mom[:, 3:4], 1e-30)
        else:
            bulk = jnp.asarray(bulk_vel, jnp.float32)

        # per-particle center & bulk rows: one chunked one-hot matmul
        # over the combined [H, 6] table ('select': the bit-exact
        # H-pass alternative for small halo counts / parity tests)
        table = jnp.concatenate([centers.astype(jnp.float32), bulk],
                                axis=-1)
        take = take_rows_matmul if frames == "matmul" else (
            lambda t, ix, chunk=None: take_rows_select(t, ix)
        )
        rows = take(table, jnp.where(valid, label, -1), chunk=chunk)
        cpp = rows[:, :3].T  # [3, N] center per particle
        bpp = rows[:, 3:].T

        rel = pos - cpp
        if box_size is not None:
            rel = rel - box_size * jnp.round(rel / box_size)
        r2 = rel[0] ** 2 + rel[1] ** 2 + rel[2] ** 2
        r = jnp.sqrt(r2)
        inv_r = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
        rhat = rel * inv_r[None]
        vrel = vel - bpp + hubble_drag * rel
        vr = rhat[0] * vrel[0] + rhat[1] * vrel[1] + rhat[2] * vrel[2]
        vrb = ((vr < 0).astype(jnp.int32)
               | ((vr > 0).astype(jnp.int32) << 1))

        # FRESH: entered this halo (or just became tracked) — the
        # reference's region-entry reset (track_orbits.py:330-351)
        prev_label = (carry.lab_sv & 0x0FFFFFFF) - 1
        prev_vrb = carry.lab_sv >> 28
        fresh = label != prev_label
        matched = valid & ~fresh & ((carry.packed >> 31) > 0)

        prev_rhat = (
            oct_decode(carry.rhat) if rhat_packed else carry.rhat
        )
        cosang = jnp.clip(
            prev_rhat[0] * rhat[0]
            + prev_rhat[1] * rhat[1]
            + prev_rhat[2] * rhat[2],
            -1.0, 1.0,
        )
        dtheta = jnp.where(matched, _acos_f32(cosang), 0.0)
        pang = jax.lax.bitcast_convert_type(
            carry.packed & jnp.uint32(0x7FFFFFFF), jnp.float32
        )
        if pericentric:
            flip = ((prev_vrb & 1) > 0) & ((vrb & 2) > 0)
        else:
            flip = ((prev_vrb & 2) > 0) & ((vrb & 1) > 0)
        apsis = matched & flip
        angle_acc = jnp.where(matched, pang + dtheta, 0.0)
        packed = jax.lax.bitcast_convert_type(
            jnp.where(apsis | ~valid, 0.0, angle_acc), jnp.uint32
        ) | (valid.astype(jnp.uint32) << 31)

        # positional single-payload event extraction (aligned contract)
        R = n // row_width
        pos_iota = jax.lax.broadcasted_iota(
            jnp.int32, (R, row_width), 1
        )
        ang15 = jax.lax.bitcast_convert_type(
            angle_acc.astype(jnp.float16), jnp.uint16
        ).astype(jnp.uint32).reshape(R, row_width)
        apsis_r = apsis.reshape(R, row_width)
        payload = jnp.where(
            apsis_r,
            ((pos_iota + 1).astype(jnp.uint32) << 15) | ang15,
            jnp.uint32(0),
        )
        count = jnp.sum(apsis_r, axis=-1, dtype=jnp.int32)
        k_eff = min(K, row_width)
        evpay = compact_payload(payload, k_eff)
        ev_pos = (evpay >> 15).astype(jnp.int32) - 1
        ev_ang = jax.lax.bitcast_convert_type(
            (evpay & jnp.uint32(0x7FFF)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        kw = ev_pos.shape[1]
        kiota = jax.lax.broadcasted_iota(jnp.int32, (R, kw), 1)
        ev_ok = kiota < count[:, None]
        new_carry = LabelCarry(
            lab_sv=jnp.where(
                valid, (label + 1) | (vrb << 28), jnp.int32(0)
            ),
            rhat=oct_encode(rhat) if rhat_packed else rhat,
            packed=packed,
        )
        return new_carry, LabelEvents(
            count=count,
            index=jnp.where(
                ev_ok,
                ev_pos + jnp.arange(R, dtype=jnp.int32)[:, None]
                * row_width,
                -1,
            )[:, :K],
            angle=jnp.where(ev_ok, ev_ang, 0.0)[:, :K],
            bulk_vel=bulk,
        )

    return step


def scan_label_events(carry, pos_seq, vel_seq, label_seq, centers_seq,
                      event_capacity: int, mode: str = "pericentric",
                      box_size=None, mass=None, bulk_vel_seq=None,
                      hubble_drag=0.0, row_width: int = 1 << 15,
                      frames: str = "matmul", rhat_packed: bool = False):
    """``lax.scan`` of :func:`make_label_orbit_step` over an
    ``[S]``-stacked device-resident sequence: ``pos_seq``/``vel_seq``
    ``[S, 3, N]``, ``label_seq`` ``[S, N]``, ``centers_seq``
    ``[S, H, 3]``.  Returns ``(carry, LabelEvents stacked [S, ...])``.
    """
    step = make_label_orbit_step(
        event_capacity, mode=mode, box_size=box_size,
        row_width=row_width, frames=frames, rhat_packed=rhat_packed,
    )
    S = label_seq.shape[0]
    drag = jnp.broadcast_to(
        jnp.asarray(hubble_drag, jnp.float32), (S,)
    )
    use_bulk = bulk_vel_seq is not None
    bulks = (jnp.zeros((S, 1, 3), jnp.float32) if not use_bulk
             else jnp.asarray(bulk_vel_seq, jnp.float32))

    def body(c, xs):
        s_pos, s_vel, s_label, s_cen, s_bulk, s_drag = xs
        return step(c, (s_pos, s_vel, s_label, s_cen,
                        s_bulk if use_bulk else None, mass, s_drag))

    return jax.lax.scan(
        body, carry,
        (pos_seq, vel_seq, label_seq, centers_seq, bulks, drag),
    )
