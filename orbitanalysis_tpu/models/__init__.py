from orbitanalysis_tpu.models import nbody, pm, pm_sharded, synthetic  # noqa: F401
from orbitanalysis_tpu.models.nbody import (  # noqa: F401
    NBodyState,
    OrbitNBodyConfig,
    direct_forces,
    kdk_step,
    make_direct_force_fn,
    point_mass_forces,
    simulate_with_tracking,
)
from orbitanalysis_tpu.models.p3m import make_p3m_force_fn  # noqa: F401
from orbitanalysis_tpu.models.pm import make_pm_force_fn, pm_forces  # noqa: F401
from orbitanalysis_tpu.models.pm_sharded import (  # noqa: F401
    make_sharded_pm_force_fn,
    make_sharded_pm_grid_solver,
)

__all__ = [
    "nbody",
    "pm",
    "synthetic",
    "NBodyState",
    "OrbitNBodyConfig",
    "direct_forces",
    "kdk_step",
    "make_direct_force_fn",
    "point_mass_forces",
    "simulate_with_tracking",
    "make_p3m_force_fn",
    "make_pm_force_fn",
    "pm_forces",
    "pm_sharded",
    "make_sharded_pm_grid_solver",
    "make_sharded_pm_force_fn",
]
