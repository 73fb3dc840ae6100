"""Persistent XLA compilation cache.

The fused sorted-join kernels cost minutes of Mosaic compile time at
large capacities (P=131072 is ~10 min); the reference has no compiled
artifacts at all, so this is a purely TPU-native concern.  Enabling
JAX's persistent compilation cache makes every re-jit after the first
run (capacity growth, process restarts, resume) a disk hit instead of a
recompile.

Enabled automatically by the tracker and the benchmark harness; set
``ORBIT_TPU_NO_CACHE=1`` to disable, ``ORBIT_TPU_CACHE_DIR`` to move it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "orbitanalysis_tpu", "xla"
)
_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns the cache directory, or ``None`` when disabled via
    ``ORBIT_TPU_NO_CACHE`` or an unsupported JAX version.
    """
    global _enabled
    if os.environ.get("ORBIT_TPU_NO_CACHE"):
        return None
    path = path or os.environ.get("ORBIT_TPU_CACHE_DIR") or _DEFAULT_DIR
    if _enabled:
        return path
    try:
        import jax

        # TPU-only: the payoff is multi-minute Mosaic compiles.  XLA:CPU
        # AOT cache entries additionally pin host machine features and
        # can SIGILL when loaded under a different feature set, so CPU
        # (fast compiles anyway) stays uncached.
        if jax.default_backend() != "tpu":
            return None
        # The 'axon' tunneled PJRT backend hangs deserializing cached
        # executables (observed: a warm-cache run futex-waits forever in
        # the first jit load); it ships its own remote compile cache, so
        # the JAX persistent cache is both broken and redundant there.
        version = getattr(
            jax.devices()[0].client, "platform_version", ""
        )
        if "axon" in version:
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_enable_compilation_cache", True)
        # long Mosaic compiles are exactly what we want cached; the
        # default 1 s threshold already admits them, but make small
        # steps cacheable too — the tracker re-jits on capacity growth
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - defensive (old jax)
        return None
    _enabled = True
    return path
