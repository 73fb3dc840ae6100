"""Sorted-stream Pallas CIC deposit: mass assignment with no scatter.

The PM deposit is the measured single-chip floor of the on-the-fly
force step (config 4): XLA's TPU scatter engine costs ~8-11 ns per
scattered *element* regardless of form (classic 8-scatter, [N, 8] row
scatter, ``segment_sum`` — all measured in ``benchmarks/deposit_probe.py``),
so 16.7M particles x 8 corners = 134M adds cost 1.4-1.6 s no matter how
they are phrased.  Sorts, by contrast, are nearly free (~2 ns/element),
and dense VPU/MXU work runs at bandwidth.  This module converts the
deposit into exactly that shape:

1. **Sort once by base cell** on a *virtual* ``(G+1)^3`` grid
   (``lax.sort``, unstable, key + 4 payload lanes).  The virtual grid
   (corner indices run to ``G`` un-wrapped) makes every particle's 8
   corner offsets a *static* stride set — no periodic-wrap corner
   cases inside the kernel; the three ``== G`` faces fold back into
   plane 0 densely at the end.
2. **Dense assembly in one Pallas sweep** over the sorted stream.  The
   whole virtual grid lives VMEM-resident as a ``[ROWS, 128]`` f32
   block (68 MB at 256^3).  Each 2048-entry sorted chunk is consumed
   by a data-dependent window loop: take the lowest un-consumed key,
   anchor a 512-cell window at its 128-aligned row, select the chunk
   entries falling in the window, and reduce them with one one-hot
   MXU matmul ``[8, V] x [V, W] -> [8, W]`` (the 8 trilinear corner
   weights are computed in-kernel from the sorted fractions).  Because
   every corner offset is a static ``(row, lane)`` pair, the 8 corner
   partials fold into 4 lane-rotated, 128-aligned read-modify-write
   row windows — the scatter engine is never touched.

Sorted keys guarantee window-loop progress (the minimum live key is
always inside its own anchor window) and make each chunk span only a
handful of windows at ~1 particle/cell densities.

Measured on the session v5e at 16.7M particles / 256^3 (marginal,
dispatch-floor-free): deposit 0.27 s vs 1.57 s for the scatter form
(**5.9x**), full PM force step 0.77 s vs 2.08 s (**2.7x**).  See
``benchmarks/deposit_probe.py``.

VMEM bounds the supported grid: the virtual mesh must fit residently
(:func:`pallas_deposit_supported`; 256^3 -> 68 MB fits the v5e's
128 MB, 512^3 -> 4.2 GB does not and falls back to the scatter path).

The reference has no force solver at all — its on-the-fly mode assumes
an external simulation code
(``/root/reference/orbitanalysis/track_orbits_onthefly.py:8-58``); this
kernel exists so the re-founded native-integrator mode (BASELINE
configs[3]) is not scatter-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_config import default_interpret

# sorted entries per grid step (input block width)
_CHUNK = 2048
# cells per assembly window; must be a multiple of 128
_WINDOW = 512
# lane width of the padded fold buffer: window + up to 127 lanes of
# static corner shift + 1 lane of z-fold
_NLANES = _WINDOW // 128 + 1


@functools.lru_cache(maxsize=1)
def _vmem_budget() -> int:
    """VMEM grid-block budget in bytes, derived from the local device.

    v4/v5/v6-class TPU cores expose ~128 MB of VMEM per core (budget
    100 MB, leaving headroom for the streamed input blocks and
    compiler temporaries); v2/v3 have ~16 MB (budget 12 MB), so
    ``deposit='auto'`` correctly falls back to the scatter engine for
    grids whose resident block cannot compile there.  Non-TPU backends
    (interpret-mode tests) get the v5e-class budget.
    """
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    if "v2" in kind or "v3" in kind:
        return 12 * 1024 * 1024
    return 100 * 1024 * 1024


def _strides(grid: int) -> tuple[int, int]:
    """Virtual-grid flattening strides (x, y); z stride is 1."""
    return (grid + 1) * (grid + 1), grid + 1


def _out_rows(grid: int) -> int:
    """Rows of the ``[ROWS, 128]`` resident output block."""
    sx, sy = _strides(grid)
    max_base = (grid - 1) * (sx + sy + 1)      # largest real base key
    rows = max_base // 128 + (sx + sy) // 128 + _NLANES + 1
    return (rows + 7) & ~7


def pallas_deposit_supported(grid: int) -> bool:
    """True when the virtual ``(grid+1)^3`` mesh fits VMEM-resident."""
    return _out_rows(grid) * 128 * 4 <= _vmem_budget() - 4 * 1024 * 1024


def _deposit_kernel(grid: int, keys_ref, fr_ref, out_ref):
    """One sorted chunk: window loop + one-hot MXU assembly."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    sx, sy = _strides(grid)
    v = keys_ref.shape[1]
    w_cells = _WINDOW
    lanes = _NLANES * 128

    keys = keys_ref[:]                                     # [1, V] i32
    fx, fy, fz, m = (fr_ref[c : c + 1] for c in range(4))  # [1, V] f32
    wx0, wx1 = (1.0 - fx) * m, fx * m
    wy0, wy1 = 1.0 - fy, fy
    wz0, wz1 = 1.0 - fz, fz
    # corner order (dx, dy, dz) lexicographic, dz minor — matches
    # models.pm._corner_weights
    w8 = jnp.concatenate(
        [
            wx0 * wy0 * wz0, wx0 * wy0 * wz1,
            wx0 * wy1 * wz0, wx0 * wy1 * wz1,
            wx1 * wy0 * wz0, wx1 * wy0 * wz1,
            wx1 * wy1 * wz0, wx1 * wy1 * wz1,
        ],
        axis=0,
    )                                                      # [8, V] f32

    eidx = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)

    def cond(st):
        return st[0] < v

    def body(st):
        (consumed,) = st
        live = eidx >= consumed
        kmask = jnp.where(live, keys, jnp.int32(1 << 30))
        anchor = (jnp.min(kmask) // 128) * 128
        sel = live & (keys < anchor + w_cells)
        idx = jnp.where(sel, keys - anchor, jnp.int32(-1))
        onehot = (
            jnp.broadcast_to(idx, (w_cells, v))
            == jax.lax.broadcasted_iota(jnp.int32, (w_cells, v), 0)
        ).astype(jnp.float32)
        partial = jax.lax.dot_general(
            w8,
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                  # [8, W]
        wide = jnp.pad(partial, ((0, 0), (0, lanes - w_cells)))
        zshift = jnp.roll(wide, 1, axis=1)                 # dz=1 corners
        r0 = anchor // 128
        for j, off in enumerate((0, sy, sx, sx + sy)):
            roff, lshift = divmod(off, 128)
            pair = wide[2 * j : 2 * j + 1] + zshift[2 * j + 1 : 2 * j + 2]
            if lshift:
                pair = jnp.roll(pair, lshift, axis=1)
            rows = jnp.concatenate(
                [pair[:, 128 * k : 128 * (k + 1)] for k in range(_NLANES)],
                axis=0,
            )                                              # [_NLANES, 128]
            out_ref[pl.ds(r0 + roff, _NLANES), :] += rows
        return (consumed + jnp.sum(sel.astype(jnp.int32)),)

    jax.lax.while_loop(cond, body, (jnp.int32(0),))


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def _deposit_call(keys, fracs, grid, interpret):
    n = keys.shape[1]
    rows = _out_rows(grid)
    return pl.pallas_call(
        functools.partial(_deposit_kernel, grid),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // _CHUNK,),
            in_specs=[
                pl.BlockSpec(
                    (1, _CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (4, _CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_budget() + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(keys, fracs)


def cic_deposit_sorted(pos, mass, grid, box_size, *, interpret=None):
    """Cloud-in-cell deposit onto a periodic ``[grid]^3`` mesh via the
    sorted-stream Pallas assembly kernel.

    Drop-in for :func:`orbitanalysis_tpu.models.pm.cic_deposit` (same
    adds modulo f32 reassociation; jit-compose it — only the Pallas
    call itself is jitted here).  ``mass`` may be scalar or ``[N]``.
    Requires :func:`pallas_deposit_supported(grid)`.
    """
    if not pallas_deposit_supported(grid):
        raise ValueError(
            f"grid {grid}^3 exceeds the VMEM-resident deposit budget "
            f"({_out_rows(grid) * 512 / 2**20:.0f} MB); use the scatter "
            "deposit (models.pm.cic_deposit) for this mesh"
        )
    if interpret is None:
        interpret = default_interpret()

    n = pos.shape[0]
    h = box_size / grid
    x = pos.astype(jnp.float32) / h - 0.5        # cell-centered coords
    i0 = jnp.floor(x)
    f = x - i0
    base = jnp.mod(i0.astype(jnp.int32), grid)   # [N, 3] in [0, grid)
    sx, sy = _strides(grid)
    keys = (base[:, 0] * sx + base[:, 1] * sy + base[:, 2]).astype(jnp.int32)
    m = jnp.broadcast_to(
        jnp.asarray(mass, jnp.float32).reshape(-1), (n,)
    )
    ops = [keys, f[:, 0], f[:, 1], f[:, 2], m]

    pad = (-n) % _CHUNK
    if pad:
        sentinel = (grid - 1) * (sx + sy + 1)    # max real key, weight 0
        ops[0] = jnp.concatenate(
            [ops[0], jnp.full((pad,), sentinel, jnp.int32)]
        )
        ops[1:] = [
            jnp.concatenate([o, jnp.zeros((pad,), jnp.float32)])
            for o in ops[1:]
        ]

    skeys, sfx, sfy, sfz, sm = jax.lax.sort(ops, num_keys=1, is_stable=False)
    fracs = jnp.stack([sfx, sfy, sfz, sm])       # [4, Np]
    flat = _deposit_call(
        skeys.reshape(1, -1), fracs, grid, bool(interpret)
    ).ravel()

    gv = grid + 1
    v3 = flat[: gv * gv * gv].reshape(gv, gv, gv)
    v3 = v3[:grid].at[0].add(v3[grid])           # fold x == G -> 0
    v3 = v3[:, :grid].at[:, 0].add(v3[:, grid])  # fold y
    v3 = v3[:, :, :grid].at[:, :, 0].add(v3[:, :, grid])  # fold z
    return v3
