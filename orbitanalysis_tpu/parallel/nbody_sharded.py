"""Multi-chip N-body forces: shard_map over the particle axis.

The TPU-native replacement for the domain decomposition an MPI N-body
code would use (the reference has no force solver or multi-node layer at
all — ``setup.py:12`` lists only numpy/h5py/pathos):

- *targets* are sharded across the mesh axis: each device computes the
  accelerations of its own particle block;
- *sources* are all-gathered over ICI once per evaluation (O(N) bytes —
  negligible against the O(N^2/D) flops each device then performs);
- the per-device kernel is the same blocked formulation as the
  single-chip path, so the Pallas kernel slots in unchanged.

This is a compute-bound all-gather pattern (the scaling-book "pure data
parallel" regime): near-linear speedup until N/D drops below the tile
size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from orbitanalysis_tpu.utils.numerics import periodic_displacement


def direct_forces_rect(
    targets: jnp.ndarray,    # [T, 3]
    sources: jnp.ndarray,    # [S, 3]
    src_mass: jnp.ndarray,   # [S]
    softening: float = 0.05,
    G: float = 1.0,
    box_size=None,
) -> jnp.ndarray:
    """Accelerations of ``targets`` due to ``sources`` (rectangular
    version of :func:`orbitanalysis_tpu.models.nbody.direct_forces`).

    Self-pairs (a target that also appears as a source) contribute zero
    because the displacement is exactly zero and d^2 is clamped.
    """
    eps2 = jnp.asarray(softening * softening, targets.dtype)
    if box_size is None:
        sqt = jnp.sum(targets * targets, axis=-1)
        sqs = jnp.sum(sources * sources, axis=-1)
        gram = jnp.matmul(
            targets, sources.T, precision=jax.lax.Precision.HIGHEST
        )
        d2 = jnp.maximum(sqt[:, None] + sqs[None, :] - 2.0 * gram, 0.0) + eps2
        d2 = jnp.maximum(d2, jnp.asarray(1e-18, targets.dtype))
        w = src_mass[None, :] * jax.lax.rsqrt(d2) / d2
        acc = G * (
            jnp.matmul(w, sources, precision=jax.lax.Precision.HIGHEST)
            - targets * jnp.sum(w, axis=1, keepdims=True)
        )
        return acc
    dx = periodic_displacement(
        sources[None, :, :] - targets[:, None, :], box_size
    )
    d2 = jnp.sum(dx * dx, axis=-1) + eps2
    d2 = jnp.maximum(d2, jnp.asarray(1e-18, targets.dtype))
    w = src_mass[None, :] * jax.lax.rsqrt(d2) / d2
    return G * jnp.sum(w[..., None] * dx, axis=1)


def make_sharded_direct_force_fn(
    mesh: Mesh,
    axis: str = "particles",
):
    """A ``force_fn(pos, mass, softening=..., G=..., box_size=...)`` that
    runs the pair sum sharded over ``mesh``'s ``axis``.

    ``N`` must be divisible by the axis size (pad with zero-mass
    particles otherwise — same protocol as the Pallas kernel).
    """

    def force(pos, mass, softening=0.05, G=1.0, box_size=None, **_):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )
        def f(pos_l, mass_l):
            pos_all = jax.lax.all_gather(pos_l, axis, axis=0, tiled=True)
            mass_all = jax.lax.all_gather(mass_l, axis, axis=0, tiled=True)
            return direct_forces_rect(
                pos_l, pos_all, mass_all,
                softening=softening, G=G, box_size=box_size,
            )

        return f(pos, mass)

    return force
