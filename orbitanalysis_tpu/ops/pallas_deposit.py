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


def _slab_rows(grid: int, slab_x: int) -> int:
    """Rows of one slab's ``[ROWS, 128]`` output block: ``slab_x``
    x-planes of rebased keys (+127 alignment slack) plus the corner
    reach ``sx + sy + 1`` and the fold-lane margin."""
    sx, sy = _strides(grid)
    max_rebase = slab_x * sx + 127 + sx + sy + 1
    rows = max_rebase // 128 + _NLANES + 1
    return (rows + 7) & ~7


def _pick_n_slabs(grid: int):
    """Fewest power-of-two slabs whose block fits VMEM, or None."""
    budget = _vmem_budget() - 4 * 1024 * 1024
    ns = 2
    while ns <= 256:
        slab_x = -(-grid // ns)
        if _slab_rows(grid, slab_x) * 128 * 4 <= budget:
            return ns
        ns *= 2
    return None


def pallas_deposit_slab_supported(grid: int) -> bool:
    """True when the Z... X-slab partitioned sorted deposit applies:
    the virtual grid exceeds one VMEM block but a slab of >= 2 planes
    fits, and flat keys stay within int32."""
    gv = grid + 1
    if gv * gv * gv >= 2**31:
        return False
    return (not pallas_deposit_supported(grid)
            and _pick_n_slabs(grid) is not None)


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


@functools.partial(jax.jit, static_argnames=("grid", "interpret", "rows"))
def _deposit_call(keys, fracs, grid, interpret, rows=None):
    n = keys.shape[1]
    if rows is None:
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


def _sorted_stream(pos, mass, grid, box_size):
    """Cell-sorted deposit stream: ``(skeys [Np], fracs [4, Np])``
    padded to a ``_CHUNK`` multiple (sentinel = max real key, weight
    0)."""
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
    return skeys, jnp.stack([sfx, sfy, sfz, sm])


def _fold_virtual(flat, grid):
    """Fold the three ``== G`` faces of the virtual mesh back into
    plane 0 and return the real ``[G, G, G]`` density."""
    gv = grid + 1
    v3 = flat[: gv * gv * gv].reshape(gv, gv, gv)
    v3 = v3[:grid].at[0].add(v3[grid])           # fold x == G -> 0
    v3 = v3[:, :grid].at[:, 0].add(v3[:, grid])  # fold y
    v3 = v3[:, :, :grid].at[:, :, 0].add(v3[:, :, grid])  # fold z
    return v3


def cic_deposit_sorted(pos, mass, grid, box_size, *, interpret=None,
                       slab_headroom: float = 2.0):
    """Cloud-in-cell deposit onto a periodic ``[grid]^3`` mesh via the
    sorted-stream Pallas assembly kernel.

    Drop-in for :func:`orbitanalysis_tpu.models.pm.cic_deposit` (same
    adds modulo f32 reassociation; jit-compose it — only the Pallas
    call itself is jitted here).  ``mass`` may be scalar or ``[N]``.

    Grids whose virtual mesh fits VMEM run the single resident block;
    larger grids (the 512^3 full-box anchor, BASELINE configs[2, 3])
    run :func:`cic_deposit_sorted_slabs` — an ``lax.scan`` over
    X-plane slabs of the SAME sorted stream (the sort is cell-major, so
    each slab is one contiguous segment), each slab assembled by the
    same window-loop kernel into a VMEM-sized block and accumulated
    into the HBM-resident virtual grid.  Requires
    :func:`pallas_deposit_supported` or
    :func:`pallas_deposit_slab_supported`.
    """
    if pallas_deposit_supported(grid):
        if interpret is None:
            interpret = default_interpret()
        skeys, fracs = _sorted_stream(pos, mass, grid, box_size)
        flat = _deposit_call(
            skeys.reshape(1, -1), fracs, grid, bool(interpret)
        ).ravel()
        return _fold_virtual(flat, grid)
    if pallas_deposit_slab_supported(grid):
        return cic_deposit_sorted_slabs(
            pos, mass, grid, box_size, interpret=interpret,
            headroom=slab_headroom,
        )
    raise ValueError(
        f"grid {grid}^3 exceeds both the VMEM-resident deposit budget "
        f"({_out_rows(grid) * 512 / 2**20:.0f} MB) and the slab "
        "partitioning's int32 key range; use the scatter deposit "
        "(models.pm.cic_deposit) for this mesh"
    )


def cic_deposit_sorted_slabs(pos, mass, grid, box_size, *,
                             n_slabs=None, headroom: float = 2.0,
                             interpret=None):
    """Scatter-free CIC deposit for grids past the single-block VMEM
    ceiling (round-3 review item 3; the 512^3 anchor of BASELINE
    configs[2, 3]).

    The cell-major sort already groups particles by x-plane, so the
    stream partitions into ``n_slabs`` contiguous segments of
    ``slab_x = ceil(G / n_slabs)`` planes each.  One ``lax.scan``
    iteration per slab: ``dynamic_slice`` a fixed-capacity segment,
    clamp foreign/padding tail entries into the slab's key range with
    zero weight (clamping a sorted segment preserves sortedness, and
    zero-weight entries deposit nothing), rebase keys to the slab's
    128-aligned origin, assemble with the SAME window-loop kernel into
    a ``[slab_rows, 128]`` VMEM block, and accumulate into the
    HBM-resident virtual grid (slabs overlap only through the corner
    margin rows, which the accumulation adds).

    ``headroom`` sizes the static per-slab segment capacity at
    ``headroom * N / n_slabs``; a slab whose true population exceeds it
    (extreme clustering) poisons the result with NaN — fail-loud, the
    :mod:`orbitanalysis_tpu.models.pm_sharded` overflow contract — so
    callers can fall back to the scatter deposit or raise ``headroom``.
    """
    if n_slabs is None:
        n_slabs = _pick_n_slabs(grid)
    if n_slabs is None:
        raise ValueError(
            f"no slab split of grid {grid}^3 fits the VMEM budget"
        )
    if interpret is None:
        interpret = default_interpret()
    sx, sy = _strides(grid)
    slab_x = -(-grid // n_slabs)
    rows_slab = _slab_rows(grid, slab_x)

    skeys, fracs = _sorted_stream(pos, mass, grid, box_size)
    npad = skeys.shape[0]
    seg_cap = min(
        npad,
        -(-int(npad * headroom) // (n_slabs * _CHUNK)) * _CHUNK,
    )

    # slab segment starts via searchsorted on the (sorted) keys
    bounds = (jnp.arange(1, n_slabs, dtype=jnp.int32) * slab_x) * sx
    starts = jnp.searchsorted(skeys, bounds).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), starts])
    ends = jnp.concatenate(
        [starts[1:], jnp.full((1,), npad, jnp.int32)]
    )
    overflow = jnp.any((ends - starts) > seg_cap)

    # flat virtual grid large enough for every slab's aligned block
    last_aligned = (((n_slabs - 1) * slab_x * sx) // 128)
    l_rows = max(_out_rows(grid), last_aligned + rows_slab + 1)

    def body(rho, xs):
        start, k = xs
        seg_k = jax.lax.dynamic_slice(skeys, (start,), (seg_cap,))
        seg_f = jax.lax.dynamic_slice(fracs, (0, start), (4, seg_cap))
        slab_lo = k * slab_x * sx
        slab_hi = slab_lo + slab_x * sx
        foreign = (seg_k < slab_lo) | (seg_k >= slab_hi)
        seg_k = jnp.clip(seg_k, slab_lo, slab_hi - 1)
        seg_f = seg_f.at[3].set(jnp.where(foreign, 0.0, seg_f[3]))
        aligned = (slab_lo // 128) * 128
        block = _deposit_call(
            (seg_k - aligned).reshape(1, -1), seg_f, grid,
            bool(interpret), rows=rows_slab,
        ).ravel()
        cur = jax.lax.dynamic_slice(rho, (aligned,), (rows_slab * 128,))
        rho = jax.lax.dynamic_update_slice(rho, cur + block, (aligned,))
        return rho, None

    rho, _ = jax.lax.scan(
        body,
        jnp.zeros((l_rows * 128,), jnp.float32),
        (starts, jnp.arange(n_slabs, dtype=jnp.int32)),
    )
    v3 = _fold_virtual(rho, grid)
    return jnp.where(overflow, jnp.float32(jnp.nan), v3)
