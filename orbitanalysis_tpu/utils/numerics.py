"""Small numeric utilities shared by host and device code.

Pure-functional JAX counterparts of the reference's ``utils.py`` kernels
(``/root/reference/orbitanalysis/utils.py:4-39``).  These work under ``jit``
and on NumPy arrays alike (the jnp ops accept NumPy inputs), and — unlike
the reference's ``recenter_coordinates`` (``utils.py:31-32``) — never mutate
their inputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def periodic_displacement(dx, box_size):
    """Minimum-image displacement in a periodic box.

    Maps each component of ``dx`` into ``[-L/2, L/2]`` (branch-free; the
    reference does the same with two conditional shifts per dim,
    ``utils.py:30-32``).  ``box_size`` may be a scalar or a length-3 vector.
    """
    box = jnp.asarray(box_size, dtype=jnp.result_type(dx))
    return dx - box * jnp.round(dx / box)


def recenter_coordinates(position, box_size):
    """Reference-compatible alias: wrap ``position`` into ``[-L/2, L/2]``.

    Pure version of ``utils.py:24-33`` (no in-place mutation).
    """
    return periodic_displacement(position, box_size)


def vector_norm(vectors, return_norm=True, return_unit_vectors=False):
    """Row-wise Euclidean norms and/or unit vectors (``utils.py:14-21``)."""
    vmags = jnp.sqrt(jnp.sum(vectors * vectors, axis=-1))
    if return_norm and return_unit_vectors:
        return vmags, vectors / vmags[..., None]
    if return_norm:
        return vmags
    if return_unit_vectors:
        return vectors / vmags[..., None]
    raise ValueError("must request the norm and/or the unit vectors")


def hubble_parameter(z, H0, Omega_m, Omega_L, Omega_k=0.0):
    """H(z) for a flat-or-curved FLRW cosmology (``utils.py:36-39``)."""
    zp1 = 1.0 + np.asarray(z, dtype=np.float64)
    return H0 * np.sqrt(Omega_m * zp1**3 + Omega_k * zp1**2 + Omega_L)
