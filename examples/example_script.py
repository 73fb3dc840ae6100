"""End-to-end example: track orbits, collate, decompose, plot.

The working counterpart of the reference's ``example_script.py`` (which
cannot run as shipped: hardcoded ``/path/to/...`` paths and an
unimplemented postprocessing API, ``/root/reference/example_script.py:9,76-95``).
This one is self-contained: it synthesizes a Kepler-like halo, defines
the two data callbacks, runs the tracker, then produces the position-
and phase-space decomposition plots the reference intended.

Run:  python examples/example_script.py [outdir]
"""

import os
import sys

import numpy as np

from orbitanalysis_tpu import Apsides, OrbitDecomposition, track_orbits
from orbitanalysis_tpu.models.synthetic import kepler_ensemble
from orbitanalysis_tpu.utils.metrics import Metrics

outdir = sys.argv[1] if len(sys.argv) > 1 else "example_out"
os.makedirs(outdir, exist_ok=True)

# ----------------------------------------------------------------------
# synthetic data: one halo of particles on Kepler orbits about a center
# ----------------------------------------------------------------------
n_particles, n_snapshots = 2000, 40
ens = kepler_ensemble(n_particles, n_snapshots, seed=1)
halo_center = np.array([50.0, 50.0, 50.0])
box_size = 100.0

snapshot_numbers = np.arange(n_snapshots)
main_branches = np.zeros((n_snapshots, 1), dtype=np.int64)  # one halo, id 0


# ----------------------------------------------------------------------
# the two-callback data contract (reference track_orbits.py:27-61)
# ----------------------------------------------------------------------
def regions(snapshot_number, halo_ids):
    return halo_center[None, :], np.array([10.0])


def load_snapshot_data(snapshot_number, region_positions, region_radii):
    s = int(snapshot_number)
    return dict(
        ids=ens.ids,
        coordinates=ens.positions[s] + halo_center,
        velocities=ens.velocities[s],
        masses=1.0,
        region_offsets=np.array([0]),
        box_size=box_size,
    )


# ----------------------------------------------------------------------
# track + postprocess + plot
# ----------------------------------------------------------------------
savefile = os.path.join(outdir, "orbits.h5")
metrics = Metrics(jsonl_path=os.path.join(outdir, "metrics.jsonl"))
track_orbits(
    snapshot_numbers,
    main_branches,
    regions,
    load_snapshot_data,
    savefile,
    mode="pericentric",
    checkpoint=True,
    metrics=metrics,
    verbose=False,
)
print("tracked; per-phase totals:", {
    k: round(v["total_s"], 3) for k, v in metrics.summary().items()
})

collated = os.path.join(outdir, "collated.h5")
Apsides(savefile).collate_apsides(
    savefile=collated, save_final_counts=True, verbose=False
)
print("collated ->", collated)

decomp = OrbitDecomposition(savefile)
final = int(snapshot_numbers[-1])
decomp.get_halo_decomposition_at_snapshot(
    halo_id=0,
    snapshot_number=final,
    snapshot_data=load_snapshot_data(final, None, None),
    angle_cut=np.pi / 4,
)
decomp.plot_position_space(
    projection="xy", savefile=os.path.join(outdir, "position_space.png")
)
decomp.plot_phase_space(
    savefile=os.path.join(outdir, "phase_space.png")
)
print("plots ->", outdir)

counts = decomp.counts
print(
    f"{(counts > 0).sum()} of {len(counts)} particles completed >=1 orbit; "
    f"max count {counts.max()}"
)
