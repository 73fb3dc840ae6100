from orbitanalysis_tpu.parallel.mesh import make_halo_mesh, make_mesh
from orbitanalysis_tpu.parallel.sharding import (
    halo_sharding,
    shard_tree,
    tree_sharding_specs,
)

__all__ = [
    "make_mesh",
    "make_halo_mesh",
    "halo_sharding",
    "shard_tree",
    "tree_sharding_specs",
]
