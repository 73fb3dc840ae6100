"""Region-frame transform: the per-particle geometry hot loop.

TPU-native re-design of the reference's ``region_frame``
(offline variant with Hubble flow: ``/root/reference/orbitanalysis/
track_orbits.py:247-290``; on-the-fly variant without:
``track_orbits_onthefly.py:71-120``).  Where the reference processes one
ragged region at a time with NumPy einsums, this version operates on the
whole padded ``[n_halos, capacity]`` batch in one fused XLA region: the
periodic wrap, bulk-velocity reduction, Hubble term, radii, unit vectors
and radial velocities all fuse into a single pass over HBM.

Layout note: coordinates arrive in the host-natural ``[H, P, 3]`` layout
but are immediately transposed to structure-of-arrays ``[3, H, P]``.  On
TPU the last dimension maps to the 128-wide lane dimension; keeping a
size-3 minor axis would waste 125/128 of every vector register and memory
tile, so all per-component math runs on ``[H, P]`` planes and the unit
vectors are returned as ``[3, H, P]``.

All reductions are masked: padding slots (``valid == False``) contribute
zero weight to the bulk velocity and produce benign values elsewhere.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

_EPS = 1e-30  # python float: a jnp scalar here would
#   initialize the XLA backend at import (breaks jax.distributed)


class RegionFrame(NamedTuple):
    """Per-particle quantities in each halo's rest frame."""

    radius: jnp.ndarray  # [H, P]    distance from halo center
    rhat: jnp.ndarray    # [3, H, P] radial unit vector (SoA layout)
    vrad: jnp.ndarray    # [H, P]    radial velocity (frame-corrected)
    bulk_vel: jnp.ndarray  # [H, 3]  bulk velocity used for each region


def region_frame(
    pos: jnp.ndarray,            # [H, P, 3] (or [3, H, P] with soa=True)
    vel: jnp.ndarray,            # [H, P, 3] (or [3, H, P] with soa=True)
    valid: jnp.ndarray,          # [H, P] bool
    center: jnp.ndarray,         # [H, 3]
    mass: Optional[jnp.ndarray] = None,      # [H, P] or None (equal-mass)
    bulk_vel: Optional[jnp.ndarray] = None,  # [H, 3] catalog bulk velocities
    box_size=None,               # scalar / (3,) / None (non-periodic)
    hubble_drag: float = 0.0,    # H(z)/(1+z); 0 disables the Hubble term
    soa: bool = False,           # inputs already [3, H, P] (staged SoA)
) -> RegionFrame:
    """Transform particles into halo rest frames and compute v_r.

    Semantics follow ``track_orbits.py:247-290``:

    - coordinates are recentered on ``center`` with a minimum-image wrap
      when ``box_size`` is given (``:254-260``);
    - the bulk velocity is the catalog value if supplied (``:274,282``),
      else the mass-weighted mean when ``mass`` is an array (``:267-272``),
      else the plain mean (``:279-280``) — here computed as masked
      reductions over the padded particle axis;
    - physical velocity adds the Hubble-flow term
      ``H * r_comoving / (1+z)`` via ``hubble_drag = H/(1+z)`` (``:276,284``;
      the on-the-fly mode passes 0, ``track_orbits_onthefly.py:96-110``);
    - ``r``, ``r_hat`` and ``v_r`` via fused multiply-reduce (``:286-288``).

    Improvement over the reference: radii are clamped away from zero before
    the division so a particle exactly at the center yields 0 instead of NaN.
    """
    w = valid.astype(pos.dtype)
    if soa:
        # staged structure-of-arrays layout: the AoS->SoA transpose
        # happened once at staging time instead of once per step
        pos3, vel3 = pos, vel
    else:
        pos3 = jnp.moveaxis(pos, -1, 0)    # [3, H, P]
        vel3 = jnp.moveaxis(vel, -1, 0)
    rel = pos3 - center.T[:, :, None]
    if box_size is not None:
        box = jnp.asarray(box_size, dtype=pos.dtype)
        if box.ndim == 1:
            # per-dimension box against the SoA [3, H, P] layout: the
            # component axis is LEADING here, so a bare (3,) vector
            # must not broadcast against the trailing particle axis
            box = box[:, None, None]
        rel = rel - box * jnp.round(rel / box)
    # Zero out padding so garbage slots can't produce inf/nan that would
    # propagate through reductions.
    rel = rel * w[None]

    if bulk_vel is None:
        if mass is not None:
            wm = w * mass
        else:
            wm = w
        denom = jnp.maximum(jnp.sum(wm, axis=-1), _EPS)   # [H]
        bulk3 = jnp.sum(wm[None] * vel3, axis=-1) / denom[None]  # [3, H]
    else:
        bulk3 = bulk_vel.T
    bulk3 = bulk3.astype(vel.dtype)

    # hubble_drag may be a traced scalar; adding the (possibly zero) term
    # unconditionally keeps the step retrace-free across snapshots.
    vrel = (
        vel3
        - bulk3[:, :, None]
        + jnp.asarray(hubble_drag, dtype=vel.dtype) * rel
    )

    r2 = rel[0] * rel[0] + rel[1] * rel[1] + rel[2] * rel[2]
    radius = jnp.sqrt(r2)
    inv_r = jnp.where(radius > 0, 1.0 / jnp.maximum(radius, _EPS), 0.0)
    rhat = rel * inv_r[None]
    vrad = (
        vrel[0] * rhat[0] + vrel[1] * rhat[1] + vrel[2] * rhat[2]
    ) * w

    return RegionFrame(radius=radius, rhat=rhat, vrad=vrad, bulk_vel=bulk3.T)
