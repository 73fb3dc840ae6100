"""Device-mesh construction.

The reference's only parallelism is a single-host process pool over halos
(``/root/reference/orbitanalysis/track_orbits.py:4,189-194``).  The
TPU-native equivalents:

- a 1D ``('halos',)`` mesh — per-halo data parallelism over ICI; the step
  is row-independent, so XLA partitions it with zero collectives;
- a 2D ``('halos', 'particles')`` mesh — additionally shards the particle
  axis inside each halo row; XLA inserts the collectives (all-gathers for
  the row sort/join, psums for the bulk-velocity reduction) along the
  'particles' axis.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_shapes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from ``{axis_name: size}`` over the given devices
    (defaults to all local devices, one axis 'halos')."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = {"halos": len(devices)}
    names = tuple(axis_shapes)
    shape = tuple(axis_shapes.values())
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {need} devices, got {len(devices)}"
        )
    return Mesh(np.asarray(devices[:need]).reshape(shape), names)


def make_halo_mesh(n_devices: int | None = None) -> Mesh:
    """1D halo-parallel mesh (the common case)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return make_mesh({"halos": len(devices)}, devices)
