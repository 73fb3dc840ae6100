"""Pallas TPU kernel: blocked direct-summation N-body forces.

The jnp formulation in :mod:`orbitanalysis_tpu.models.nbody` materializes
the full ``[N, N]`` pair matrix in HBM (the Gram trick), capping N at a
few tens of thousands.  This kernel is the flash-attention-style blocked
version: the grid tiles the *target* axis; each program streams all
*source* tiles through VMEM, accumulating accelerations in a scratch
register block — O(N^2) compute, O(N) memory traffic per axis.

Layout: positions arrive as ``[N, 3]`` (host-natural) and are transposed
to structure-of-arrays ``[3, N]`` planes on device before the call so the
lane dimension is fully used (a size-3 minor axis would waste 125/128 of
every tile — see the geometry module).

Padding protocol: pad N up to a tile multiple with **zero-mass sources**
at infinity-free positions — zero mass means zero contribution, so no
masks are needed anywhere in the inner loop; padded target rows compute
garbage that the caller slices off.

Self-interaction: ``d^2`` is clamped below by ``max(softening^2, tiny)``;
the numerator ``dx`` is exactly zero for the self pair, so the self force
vanishes for any softening >= 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orbitanalysis_tpu.utils.padding import round_up

_TILE_T = 256    # targets per program (sublane-aligned)
_TILE_S = 1024   # sources per inner step (lane-aligned)
_TINY = 1e-18


def _force_kernel(xs_ref, ys_ref, zs_ref, ms_ref,
                  ax_ref, ay_ref, az_ref, *, eps2, n_src_tiles, box):
    """One target tile vs all source tiles.

    refs: xs/ys/zs/ms are the full [1, N] SoA planes in VMEM (shared by
    every program); outputs are the [1, TILE_T] acceleration planes for
    this program's target tile.  ``box`` enables per-pair minimum-image
    wrapping (None = free space).
    """
    i = pl.program_id(0)
    t0 = i * _TILE_T
    xt = xs_ref[0, pl.ds(t0, _TILE_T)]
    yt = ys_ref[0, pl.ds(t0, _TILE_T)]
    zt = zs_ref[0, pl.ds(t0, _TILE_T)]

    def wrap(d):
        if box is None:
            return d
        return d - box * jnp.round(d * (1.0 / box))

    def body(j, acc):
        ax, ay, az = acc
        s0 = j * _TILE_S
        xs = xs_ref[0, pl.ds(s0, _TILE_S)]
        ys = ys_ref[0, pl.ds(s0, _TILE_S)]
        zs = zs_ref[0, pl.ds(s0, _TILE_S)]
        ms = ms_ref[0, pl.ds(s0, _TILE_S)]
        dx = wrap(xs[None, :] - xt[:, None])    # [T, S]
        dy = wrap(ys[None, :] - yt[:, None])
        dz = wrap(zs[None, :] - zt[:, None])
        d2 = dx * dx + dy * dy + dz * dz + eps2
        d2 = jnp.maximum(d2, _TINY)
        w = ms[None, :] * jax.lax.rsqrt(d2) / d2   # m / d^3
        ax = ax + jnp.sum(w * dx, axis=1)
        ay = ay + jnp.sum(w * dy, axis=1)
        az = az + jnp.sum(w * dz, axis=1)
        return ax, ay, az

    zero = jnp.zeros((_TILE_T,), jnp.float32)
    ax, ay, az = jax.lax.fori_loop(0, n_src_tiles, body, (zero, zero, zero))
    ax_ref[0, :] = ax
    ay_ref[0, :] = ay
    az_ref[0, :] = az


try:  # pallas imports fail on some CPU-only builds; fall back gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


@functools.partial(
    jax.jit, static_argnames=("softening", "G", "box_size", "interpret")
)
def direct_forces_pallas(
    pos: jnp.ndarray,     # [N, 3]
    mass: jnp.ndarray,    # [N]
    softening: float = 0.05,
    G: float = 1.0,
    box_size: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked direct-summation acceleration via a Pallas TPU kernel.

    ``box_size`` enables per-pair minimum-image wrapping (the jnp
    periodic path materializes the [N, N, 3] displacement tensor; here
    it stays tile-local in VMEM).  ``interpret=True`` runs the kernel in
    interpreter mode (CPU tests).
    """
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable in this environment")
    n = pos.shape[0]
    n_pad = round_up(n, max(_TILE_T, _TILE_S))
    soa = jnp.moveaxis(pos.astype(jnp.float32), -1, 0)     # [3, N]
    soa = jnp.pad(soa, ((0, 0), (0, n_pad - n)))
    m = jnp.pad(mass.astype(jnp.float32), (0, n_pad - n))  # zero-mass pad

    n_t_tiles = n_pad // _TILE_T
    n_s_tiles = n_pad // _TILE_S
    kernel = functools.partial(
        _force_kernel,
        eps2=float(softening * softening),
        n_src_tiles=n_s_tiles,
        box=None if box_size is None else float(box_size),
    )
    # inputs stay whole in (compiler-chosen) memory; each program slices
    # its target tile and streams source tiles
    ax, ay, az = pl.pallas_call(
        kernel,
        grid=(n_t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)
        ],
        out_specs=[
            pl.BlockSpec(
                (1, _TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM
            )
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32) for _ in range(3)
        ],
        interpret=interpret,
    )(
        soa[0][None, :], soa[1][None, :], soa[2][None, :], m[None, :]
    )
    acc = jnp.stack([ax[0, :n], ay[0, :n], az[0, :n]], axis=-1)
    return G * acc
