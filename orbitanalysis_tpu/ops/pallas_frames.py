"""VMEM-blocked one-hot frame kernels for the label-native detector.

The label-native step (:mod:`orbitanalysis_tpu.ops.label_step`) needs
two non-elementwise passes per snapshot — per-particle halo frame rows
(``table[label]``) and per-halo bulk-velocity moments (a segment sum
grouped by label).  Both already run as one-hot MXU matmuls in XLA.

**Measured status (v5e, benchmarks/label_ablation.py at N=2.1M x
H=64): these kernels are SLOWER than the XLA form (31.7 vs
21.3 ms/scan full step) and are therefore NOT the default** —
XLA fuses the iota-compare one-hot into the MXU operand feed of an
unchunked dot, so the hypothesized ``[N, H]`` HBM round-trip these
kernels eliminate never happens; the grid machinery only adds
overhead.  The XLA path's real cost was the f32
``Precision.HIGHEST`` dot (~6 operand passes), fixed instead by the
exact bf16x3 table split in
:func:`orbitanalysis_tpu.ops.label_step.take_rows_matmul`.  Kept as
``frames='pallas'`` (parity-tested) for future re-evaluation on
hardware where the fusion behaves differently.

The kernels generate the one-hot *inside* VMEM, block by block, so
the only HBM traffic is the labels (4 B), the values (12-16 B), and
the frame rows (24-32 B) — the one-hot never exists outside the chip:

- :func:`frame_rows`: ``out [C, N] = table [C, H] @ onehot(label)`` —
  grid over ``N`` blocks; each step builds ``onehot [H, B]`` from a
  lane-broadcast compare against a sublane iota and feeds it straight
  to the MXU.  Output is SoA (``[C, N]``) because that is the layout
  the detector consumes (``rel = pos - rows[:3]``) — no transposes.
  Exact: each output element is a sum with exactly one nonzero
  product (``1.0 * x``), bit-identical to a gather.
- :func:`segment_moments`: ``[H, 4]`` mass-weighted velocity moments
  ``[m vx, m vy, m vz, m]`` accumulated across grid steps into a
  VMEM-resident output block (TPU grids are sequential, so ``+=`` on
  the same output block is the standard accumulation idiom).  The
  weight-by-validity and the moment stacking fuse into the kernel, so
  the stacked ``[4, N]`` moments array never exists either.  f32
  accumulation in block-major order — same tolerance class as the XLA
  chunked form (``tests/test_label.py::test_label_bulk_estimation_close``).

Reference semantics being accelerated: the per-halo moving-center
frame (``/root/reference/orbitanalysis/track_orbits.py:267-284``) over
the dynamic membership sets (``:300-309``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_config import default_interpret

__all__ = [
    "frame_rows",
    "frame_rows_bf16x3",
    "segment_moments",
    "segment_moments_bf16x3",
]

# particles per grid step: onehot [H, B] f32 must fit VMEM alongside
# the double-buffered input blocks (H <= 1024 -> <= 64 MB; typical
# halo counts keep it far smaller)
_BLOCK = 1 << 15


def _onehot_hb(lab, h):
    """``[H, B]`` f32 one-hot of ``lab [1, B]`` (label -1 -> zero col)."""
    b = lab.shape[1]
    return (
        jnp.broadcast_to(lab, (h, b))
        == jax.lax.broadcasted_iota(jnp.int32, (h, b), 0)
    ).astype(jnp.float32)


def _frame_rows_kernel(h, lab_ref, tab_ref, out_ref):
    onehot = _onehot_hb(lab_ref[:], h)                     # [H, B]
    out_ref[:] = jax.lax.dot_general(
        tab_ref[:],                                        # [C, H]
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [C, B]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _frame_rows_call(lab2, table, block, interpret):
    c, h = table.shape
    n = lab2.shape[1]
    return pl.pallas_call(
        functools.partial(_frame_rows_kernel, h),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lab2, table)


def frame_rows(table, labels, *, block=_BLOCK, interpret=None):
    """``table.T[:, labels]`` with zeros where ``labels < 0``.

    ``table``: ``[H, C]`` f32 (row per halo — the
    :func:`orbitanalysis_tpu.ops.label_step.take_rows_matmul` contract);
    ``labels``: ``[N]`` int32 in ``[-1, H)``.  Returns **SoA**
    ``[C, N]`` f32.  ``N`` is padded to ``block`` internally.
    """
    if interpret is None:
        interpret = default_interpret()
    table = jnp.asarray(table, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    n = labels.shape[0]
    # round the block up to a lane multiple: real-TPU BlockSpecs
    # need a 128-aligned lane width (the pad below absorbs the
    # difference with inert -1/0 entries)
    block = min(block, max(128, -(-n // 128) * 128))
    pad = (-n) % block
    if pad:
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), -1, jnp.int32)]
        )
    out = _frame_rows_call(
        labels.reshape(1, -1), table.T, block, interpret
    )
    return out[:, :n] if pad else out


def _split3(x):
    """Exact 3-piece bf16 split (see
    :func:`orbitanalysis_tpu.ops.label_step._split_bf16x3`) — local copy
    to keep the kernel modules import-light."""

    def trunc(v):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(v, jnp.uint32)
            & jnp.uint32(0xFFFF0000),
            jnp.float32,
        )

    p0 = trunc(x)
    r1 = x - p0
    p1 = trunc(r1)
    p2 = r1 - p1
    return (p0.astype(jnp.bfloat16), p1.astype(jnp.bfloat16),
            p2.astype(jnp.bfloat16))


def _frame_rows_bf16x3_kernel(h, lab_ref, tab_ref, out_ref):
    lab = lab_ref[:]                                       # [1, B]
    onehot = (
        jnp.broadcast_to(lab, (h, lab.shape[1]))
        == jax.lax.broadcasted_iota(jnp.int32, (h, lab.shape[1]), 0)
    )
    cat = jnp.concatenate(_split3(tab_ref[:]), axis=0)     # [3C, H]
    c = tab_ref.shape[0]
    out3 = jax.lax.dot_general(
        cat, onehot.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [3C, B]
    out_ref[:] = (out3[:c] + out3[c:2 * c]) + out3[2 * c:]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _frame_rows_bf16x3_call(lab2, table_t, block, interpret):
    c, h = table_t.shape
    n = lab2.shape[1]
    return pl.pallas_call(
        functools.partial(_frame_rows_bf16x3_kernel, h),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lab2, table_t)


def frame_rows_bf16x3(table, labels, *, block=_BLOCK, interpret=None):
    """:func:`frame_rows` in ONE native bf16 MXU pass over the exactly
    bf16x3-split table — bit-identical to a gather (each output element
    is a sum of one nonzero product per split piece, and the pieces
    re-sum exactly), measured 1.5-2x the f32 ``Precision.HIGHEST``
    in-kernel dot and ~1.5x the XLA one-hot conv at the bench shape
    (0.163 vs 0.241/0.380 ms/pass at N=2.1M x H=64,
    ``benchmarks/_frames2d_probe.py`` removed after landing — the
    numbers live in BASELINE.md round 4).

    ``labels`` may be any shape (flattened internally); returns SoA
    ``[C, N]`` f32 over the flattened order.
    """
    if interpret is None:
        interpret = default_interpret()
    table = jnp.asarray(table, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32).reshape(-1)
    n = labels.shape[0]
    block = min(block, max(128, -(-n // 128) * 128))
    pad = (-n) % block
    if pad:
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), -1, jnp.int32)]
        )
    out = _frame_rows_bf16x3_call(
        labels.reshape(1, -1), table.T, block, interpret
    )
    return out[:, :n] if pad else out


def _segment_moments_bf16x3_kernel(h, lab_ref, val_ref, w_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    lab = lab_ref[:]                                       # [1, B]
    onehot = (
        jnp.broadcast_to(lab, (h, lab.shape[1]))
        == jax.lax.broadcasted_iota(jnp.int32, (h, lab.shape[1]), 0)
    )
    w = jnp.where(lab >= 0, w_ref[:], 0.0)                 # [1, B]
    vals = jnp.concatenate([val_ref[:] * w, w], axis=0)    # [4, B]
    cat = jnp.concatenate(_split3(vals), axis=0)           # [12, B]
    out3 = jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), cat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [H, 12]
    out_ref[:] += (out3[:, :4] + out3[:, 4:8]) + out3[:, 8:]


@functools.partial(jax.jit, static_argnames=("h", "block", "interpret"))
def _segment_moments_bf16x3_call(lab2, vel, w2, h, block, interpret):
    n = lab2.shape[1]
    return pl.pallas_call(
        functools.partial(_segment_moments_bf16x3_kernel, h),
        out_shape=jax.ShapeDtypeStruct((h, 4), jnp.float32),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, 4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lab2, vel, w2)


def segment_moments_bf16x3(labels, vel, mass=None, *, n_halos,
                           block=_BLOCK, interpret=None):
    """:func:`segment_moments` in ONE native bf16 MXU pass over the
    exactly bf16x3-split weighted values — the same sums as the f32
    form up to (already tolerance-classed) accumulation order: each
    per-halo piece sum is a 0/1-weighted f32-accumulated reduction and
    the three pieces re-sum the exact split.  Measured 1.7x the XLA
    f32 one-hot conv and 4x the HIGHEST in-kernel dot at the bench
    shape (0.309 vs 0.530/1.224 ms/pass at N=2.1M x H=64).

    ``labels``/``mass`` any shape, ``vel`` ``[3, ...]`` — flattened
    internally.
    """
    if interpret is None:
        interpret = default_interpret()
    labels = jnp.asarray(labels, jnp.int32).reshape(-1)
    n = labels.shape[0]
    vel = jnp.asarray(vel, jnp.float32).reshape(3, n)
    block = min(block, max(128, -(-n // 128) * 128))
    w = (jnp.ones((n,), jnp.float32) if mass is None
         else jnp.asarray(mass, jnp.float32).reshape(-1))
    pad = (-n) % block
    if pad:
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), -1, jnp.int32)]
        )
        vel = jnp.concatenate(
            [vel, jnp.zeros((3, pad), jnp.float32)], axis=1
        )
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    return _segment_moments_bf16x3_call(
        labels.reshape(1, -1), vel, w.reshape(1, -1), int(n_halos),
        block, interpret
    )


def _segment_moments_kernel(h, lab_ref, val_ref, w_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    lab = lab_ref[:]                                       # [1, B]
    onehot = _onehot_hb(lab, h)                            # [H, B]
    w = jnp.where(lab >= 0, w_ref[:], 0.0)                 # [1, B]
    vals = jnp.concatenate([val_ref[:] * w, w], axis=0)    # [4, B]
    out_ref[:] += jax.lax.dot_general(
        onehot,
        vals,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [H, 4]


@functools.partial(jax.jit, static_argnames=("h", "block", "interpret"))
def _segment_moments_call(lab2, vel, w2, h, block, interpret):
    n = lab2.shape[1]
    return pl.pallas_call(
        functools.partial(_segment_moments_kernel, h),
        out_shape=jax.ShapeDtypeStruct((h, 4), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((h, 4), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lab2, vel, w2)


def segment_moments(labels, vel, mass=None, *, n_halos, block=_BLOCK,
                    interpret=None):
    """Per-halo mass-weighted velocity moments ``[H, 4]`` =
    ``[sum m v, sum m]`` grouped by ``labels`` (−1 ignored).

    ``vel``: ``[3, N]`` f32 SoA; ``mass``: ``[N]`` or None (unit
    weights).  The weighting, validity mask, and moment stacking run
    inside the kernel — nothing ``[4, N]``-sized is materialized.
    """
    if interpret is None:
        interpret = default_interpret()
    labels = jnp.asarray(labels, jnp.int32)
    vel = jnp.asarray(vel, jnp.float32)
    n = labels.shape[0]
    # round the block up to a lane multiple: real-TPU BlockSpecs
    # need a 128-aligned lane width (the pad below absorbs the
    # difference with inert -1/0 entries)
    block = min(block, max(128, -(-n // 128) * 128))
    w = (jnp.ones((n,), jnp.float32) if mass is None
         else jnp.asarray(mass, jnp.float32))
    pad = (-n) % block
    if pad:
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), -1, jnp.int32)]
        )
        vel = jnp.concatenate(
            [vel, jnp.zeros((3, pad), jnp.float32)], axis=1
        )
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    return _segment_moments_call(
        labels.reshape(1, -1), vel, w.reshape(1, -1), int(n_halos),
        block, interpret
    )
