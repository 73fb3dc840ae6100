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


def myin1d(a, b, kind=None):
    """Indices into ``a`` of the values of ``b``, in ``b``'s order —
    the reference's join helper, re-exported for user analysis scripts
    that call it directly (``/root/reference/orbitanalysis/utils.py:4-11``;
    the engines themselves use sort-merge joins and positional events
    instead).

    Like the reference, every value of ``b`` must be present in ``a``
    and ``a`` must not contain duplicates of those values.  Runs in
    NumPy (host-side bookkeeping; it is not a device kernel).  This
    implementation replaces the reference's ``in1d`` + double-argsort
    with one ``argsort`` + ``searchsorted`` (O((n+m) log n) and no
    boolean scan over ``a``), returning identical results.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    sorter = np.argsort(a, kind="stable")
    return sorter[np.searchsorted(a, b, sorter=sorter)]


def oct_encode(rhat):
    """Octahedral-map unit-vector compression: ``[3, ...]`` f32 ->
    ``[...]`` uint32 (16 bits per octahedral coordinate; measured
    angular error ~1e-4 rad mean, ~7e-4 max at fold edges — the same
    order as the savefile's f16 angle resolution).

    The carry memory diet for billion-particle tracking: the radial
    unit vector is 12 of ~24 carried bytes/particle, and it feeds ONLY
    the angle accumulator (``arccos(r_prev . r_cur)``) — radial-
    velocity signs, hence apsis COUNTS, are recomputed from positions
    every step and cannot be affected by this quantization.
    Zero vectors encode to the +z pole (consumers mask invalid slots).
    """
    x, y, z = rhat[0], rhat[1], rhat[2]
    s = jnp.maximum(jnp.abs(x) + jnp.abs(y) + jnp.abs(z), 1e-30)
    px, py = x / s, y / s
    fx = (1.0 - jnp.abs(py)) * jnp.where(px >= 0, 1.0, -1.0)
    fy = (1.0 - jnp.abs(px)) * jnp.where(py >= 0, 1.0, -1.0)
    px = jnp.where(z < 0, fx, px)
    py = jnp.where(z < 0, fy, py)
    qx = jnp.clip(
        jnp.round((px * 0.5 + 0.5) * 65535.0), 0, 65535
    ).astype(jnp.uint32)
    qy = jnp.clip(
        jnp.round((py * 0.5 + 0.5) * 65535.0), 0, 65535
    ).astype(jnp.uint32)
    return qx | (qy << 16)


def oct_decode(packed):
    """Inverse of :func:`oct_encode`: uint32 -> normalized ``[3, ...]``."""
    qx = (packed & jnp.uint32(0xFFFF)).astype(jnp.float32)
    qy = (packed >> 16).astype(jnp.float32)
    px = qx * (2.0 / 65535.0) - 1.0
    py = qy * (2.0 / 65535.0) - 1.0
    z = 1.0 - jnp.abs(px) - jnp.abs(py)
    t = jnp.maximum(-z, 0.0)
    x = px - jnp.where(px >= 0, t, -t)
    y = py - jnp.where(py >= 0, t, -t)
    inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-30)
    return jnp.stack([x * inv, y * inv, z * inv])
