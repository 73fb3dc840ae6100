"""Distributed particle-mesh Poisson solve: pencil-decomposed FFT.

Scales the PM force grid past one chip's HBM (1024^3 f32 force fields are
~13 GB; BASELINE configs [2]/[4] at full box).  The classic slab/pencil
scheme, expressed with ``shard_map`` + ``all_to_all`` over ICI:

  rho [X, Y, Z] sharded on X
    -> local rFFT over (Y, Z)                     (no communication)
    -> all_to_all: gather X, scatter Y            (one ICI collective)
    -> local FFT over X                           (now spectral in all axes)
    -> Green's function x i*k gradient (3 components)
    -> local iFFT over X
    -> all_to_all back: gather Y, scatter X
    -> local irFFT over (Y, Z)

The k-space multiply needs each shard's Y-offset, obtained from
``jax.lax.axis_index`` inside the mapped function.  Deposit and
interpolation stay host/local (they are O(N) and particle-sharded
separately); this module distributes the O(G^3 log G) solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved out of experimental in newer jax (no check_rep kwarg)
    from jax import shard_map
    _SHARD_MAP_KW = {}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
    _SHARD_MAP_KW = {"check_rep": False}


def make_sharded_pm_grid_solver(
    mesh: Mesh,
    grid: int,
    axis: str = "x",
    deconvolve: bool = False,
):
    """Build ``solve(rho, box_size, G) -> force [3, G, G, G]`` with the
    FFT pipeline sharded over ``mesh``'s ``axis``.

    ``grid`` must be divisible by the axis size.  Input ``rho`` is
    ``[G, G, G]`` sharded on its first dimension (a replicated array is
    resharded automatically); outputs are sharded the same way.
    """
    n_dev = int(mesh.shape[axis])
    if grid % n_dev != 0:
        raise ValueError(f"grid {grid} not divisible by mesh axis {n_dev}")
    loc = grid // n_dev

    # spectral coordinates (cell units)
    kx_full = 2 * np.pi * np.fft.fftfreq(grid)
    ky_full = 2 * np.pi * np.fft.fftfreq(grid)
    kz_full = 2 * np.pi * np.fft.rfftfreq(grid)

    def local_solve(rho_l, box_size):
        """rho_l: [loc, G, Z->...] one X-slab; returns 3 force slabs."""
        i = jax.lax.axis_index(axis)
        h = box_size / grid

        rk = jnp.fft.rfftn(rho_l, axes=(1, 2))          # [loc, G, Z]
        # pencil transpose: X gathered, Y scattered -> [G, loc, Z]
        rk = jax.lax.all_to_all(
            rk, axis, split_axis=1, concat_axis=0, tiled=True
        )
        rk = jnp.fft.fft(rk, axis=0)                     # spectral in X

        kx = jnp.asarray(kx_full, jnp.float32)[:, None, None]
        ky_l = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(ky_full, jnp.float32), i * loc, loc
        )[None, :, None]
        kz = jnp.asarray(kz_full, jnp.float32)[None, None, :]
        k2 = kx * kx + ky_l * ky_l + kz * kz

        green = jnp.where(
            k2 > 0, -4 * jnp.pi / jnp.maximum(k2, 1e-30), 0.0
        ) / h
        if deconvolve:
            sinc = lambda t: jnp.sinc(t / (2 * jnp.pi))  # noqa: E731
            w = (sinc(kx) * sinc(ky_l) * sinc(kz)) ** 2
            green = green / jnp.maximum(w, 1e-4) ** 2
        phi_k = green.astype(jnp.complex64) * rk

        outs = []
        for kvec in (kx, ky_l, kz):
            fk = (-1j * kvec / h).astype(jnp.complex64) * phi_k
            fk = jnp.fft.ifft(fk, axis=0)                # back from X
            fk = jax.lax.all_to_all(
                fk, axis, split_axis=0, concat_axis=1, tiled=True
            )                                            # -> [loc, G, Z]
            outs.append(
                jnp.fft.irfftn(fk, s=(grid, grid), axes=(1, 2))
            )
        return jnp.stack(outs)                           # [3, loc, G, G]

    mapped = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(None, axis),
        **_SHARD_MAP_KW,
    )

    def solve(rho, box_size, G=1.0):
        rho = jax.device_put(rho, NamedSharding(mesh, P(axis)))
        out = mapped(rho.astype(jnp.float32),
                     jnp.asarray(box_size, jnp.float32))
        return G * out

    solve.local_solve = local_solve  # shared by the full force path
    solve.slab = loc
    return solve


def make_sharded_pm_force_fn(
    mesh: Mesh,
    grid: int,
    axis: str = "x",
    deconvolve: bool = False,
):
    """Fully distributed PM forces: particles AND the FFT sharded over
    one mesh axis.

    Pipeline inside one ``shard_map``: each shard CIC-deposits its own
    particles onto a full local mesh, a ``psum`` combines the meshes,
    each shard solves its X-slab through the pencil FFT, the force slabs
    are ``all_gather``-ed, and each shard CIC-interpolates its own
    particles.  Per-device memory is O(grid^3) (the mesh), while the
    particle arrays stay sharded — the configuration for 1e8+ particles
    on moderate grids.

    Returns ``force(pos, mass, box_size=..., G=...)`` with ``pos``/
    ``mass`` sharded (or automatically placed) on ``axis``; particle
    count must divide the axis size.
    """
    from orbitanalysis_tpu.models.pm import cic_deposit, cic_interpolate

    solver = make_sharded_pm_grid_solver(
        mesh, grid, axis=axis, deconvolve=deconvolve
    )
    loc = solver.slab
    n_dev = int(mesh.shape[axis])

    def local_force(pos_l, mass_l, box_size):
        i = jax.lax.axis_index(axis)
        rho = cic_deposit(pos_l, mass_l, grid, box_size)
        rho = jax.lax.psum(rho, axis)                 # full mesh, all shards
        slab = jax.lax.dynamic_slice_in_dim(rho, i * loc, loc, axis=0)
        force_slab = solver.local_solve(slab, box_size)  # [3, loc, G, G]
        field = jax.lax.all_gather(
            force_slab, axis, axis=1, tiled=True
        )                                              # [3, G, G, G]
        return cic_interpolate(field, pos_l, grid, box_size)

    mapped = shard_map(
        local_force,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        **_SHARD_MAP_KW,
    )

    def force(pos, mass, box_size=None, G=1.0, **_):
        if box_size is None:
            raise ValueError("PM forces require a periodic box_size")
        n = pos.shape[0]
        if n % n_dev != 0:
            raise ValueError(
                f"particle count {n} not divisible by mesh axis {n_dev}; "
                "pad with zero-mass particles"
            )
        pos = jax.device_put(pos, NamedSharding(mesh, P(axis)))
        mass = jax.device_put(mass, NamedSharding(mesh, P(axis)))
        return G * mapped(
            pos.astype(jnp.float32), mass.astype(jnp.float32),
            jnp.asarray(box_size, jnp.float32),
        )

    return force
