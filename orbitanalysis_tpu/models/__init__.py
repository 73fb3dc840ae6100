from orbitanalysis_tpu.models import synthetic  # noqa: F401

__all__ = ["synthetic"]
