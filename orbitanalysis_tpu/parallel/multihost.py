"""Multi-host (multi-slice / DCN) glue.

The reference's only parallel substrate is a single-host fork pool
(``/root/reference/orbitanalysis/track_orbits.py:4,194``).  The TPU-native
multi-host story (SURVEY.md §5 "Distributed communication backend"):

- ``jax.distributed.initialize()`` once per process (coordinator from the
  launcher environment);
- device-level collectives ride ICI/DCN inside jit — nothing to do here;
- host-level output assembly (the HDF5 writers are host code) uses
  ``multihost_utils.process_allgather`` so process 0 can write the
  savefile with every shard's compacted events.

These helpers are thin by design: on a single host every function
degrades to the identity, so the engine code is host-count agnostic.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op if already initialized or when
    running single-process).

    Must not touch the XLA backend before ``jax.distributed.initialize``
    (``jax.process_count()`` would initialize it), so the
    already-initialized check uses ``jax.distributed.is_initialized``.
    """
    if jax.distributed.is_initialized():
        return  # already initialized by the launcher
    if coordinator_address is None and num_processes is None:
        return  # single process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should perform host-side writes."""
    return jax.process_index() == 0


def allgather_host(x):
    """Gather a per-process host array to every process (identity on a
    single host)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def broadcast_from_primary(x):
    """Broadcast a host value from process 0 (identity on one host)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(x)
