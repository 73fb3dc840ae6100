from orbitanalysis_tpu.parallel.mesh import make_halo_mesh, make_mesh
from orbitanalysis_tpu.parallel.sharding import (
    halo_sharding,
    shard_tree,
    tree_sharding_specs,
)
from orbitanalysis_tpu.parallel.nbody_sharded import (
    direct_forces_rect,
    make_sharded_direct_force_fn,
)
from orbitanalysis_tpu.parallel.sorted_sharded import (
    make_sharded_sorted_step,
)
from orbitanalysis_tpu.parallel import multihost

__all__ = [
    "make_mesh",
    "make_halo_mesh",
    "halo_sharding",
    "shard_tree",
    "tree_sharding_specs",
    "direct_forces_rect",
    "make_sharded_sorted_step",
    "make_sharded_direct_force_fn",
    "multihost",
]
