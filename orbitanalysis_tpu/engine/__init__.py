from orbitanalysis_tpu.engine.tracker import track_orbits  # noqa: F401

__all__ = ["track_orbits"]
