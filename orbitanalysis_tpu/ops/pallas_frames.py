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

__all__ = ["frame_rows", "segment_moments"]

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
