"""Sharding specs for the tracker state over a device mesh.

Strategy (SURVEY.md §2 "Parallelism inventory"): the leading axis of every
state/batch tensor is the halo axis — shard it over the mesh's 'halos'
axis; if the mesh also has a 'particles' axis, shard the second (particle
capacity) axis across it.  Everything else (centers' coordinate dim,
scalars) is replicated.  The step function is then simply jit'd with these
shardings; XLA's SPMD partitioner inserts any needed collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tree_sharding_specs(tree, mesh: Mesh):
    """A matching PyTree of PartitionSpecs for a state/batch PyTree.

    Rank-1+: axis 0 -> 'halos'; axis 1 -> 'particles' if that mesh axis
    exists and the dim is the (large) particle capacity; scalars replicated.
    """
    has_particles = "particles" in mesh.axis_names

    def spec(leaf):
        ndim = np.ndim(leaf)
        if ndim == 0:
            return P()
        shape = np.shape(leaf)
        if ndim >= 3 and shape[0] == 3 and shape[-1] != 3:
            # SoA vector leaf [3, H, P]: axis 0 is the component axis.
            # AoS leaves ([H, P, 3] and [H, 3]) are excluded by the
            # trailing-axis test even when n_halos happens to equal 3.
            parts = [None, "halos"] + [None] * (ndim - 2)
            if ndim >= 3 and has_particles and shape[2] > 4:
                parts[2] = "particles"
        else:
            parts = ["halos"] + [None] * (ndim - 1)
            if ndim >= 2 and has_particles and shape[1] > 4:
                parts[1] = "particles"
        return P(*parts)

    return jax.tree.map(spec, tree)


def halo_sharding(mesh: Mesh):
    """Return a closure bundle used by the engine: mesh + spec builder."""
    return mesh


def _put(leaf, ns: NamedSharding):
    """device_put that also works when ``ns`` spans multiple processes:
    each process places its addressable shards from its full host copy
    (every process holds the same host array — the tracker's packing is
    replicated host work) and the shards are assembled into one global
    array."""
    if jax.process_count() == 1 or all(
        d.process_index == jax.process_index()
        for d in ns.device_set
    ):
        return jax.device_put(leaf, ns)
    arr = np.asarray(leaf)
    idx_map = ns.addressable_devices_indices_map(arr.shape)
    shards = [jax.device_put(arr[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(arr.shape, ns, shards)


def shard_tree(tree, mesh: Mesh):
    """device_put a PyTree with per-leaf NamedShardings for ``mesh``."""
    specs = tree_sharding_specs(tree, mesh)
    return jax.tree.map(
        lambda leaf, s: _put(leaf, NamedSharding(mesh, s)),
        tree,
        specs,
    )
