from orbitanalysis_tpu.ops.geometry import region_frame
from orbitanalysis_tpu.ops.join import (
    gather_rows,
    match_ids,
    merge_join,
    sort_rows,
    two_way_match,
)
from orbitanalysis_tpu.ops.apsis import (
    Carry,
    SnapshotBatch,
    StepEvents,
    init_carry,
    make_orbit_step,
    make_static_orbit_step,
)

__all__ = [
    "region_frame",
    "gather_rows",
    "match_ids",
    "merge_join",
    "sort_rows",
    "two_way_match",
    "Carry",
    "SnapshotBatch",
    "StepEvents",
    "init_carry",
    "make_orbit_step",
    "make_static_orbit_step",
]
