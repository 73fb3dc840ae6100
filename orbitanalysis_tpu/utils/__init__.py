from orbitanalysis_tpu.utils.padding import (
    INVALID_ID,
    invalid_id_for,
    pack_ragged,
    pack_ragged_to,
    round_up,
    unpack_mask,
)
from orbitanalysis_tpu.utils.metrics import Metrics, phase_timer, trace
from orbitanalysis_tpu.utils.numerics import (
    hubble_parameter,
    periodic_displacement,
    recenter_coordinates,
    vector_norm,
)

__all__ = [
    "INVALID_ID",
    "invalid_id_for",
    "pack_ragged",
    "pack_ragged_to",
    "round_up",
    "unpack_mask",
    "Metrics",
    "phase_timer",
    "trace",
    "hubble_parameter",
    "periodic_displacement",
    "recenter_coordinates",
    "vector_norm",
]
