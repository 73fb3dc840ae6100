"""Interpret-mode selection for the Pallas kernels.

The kernels must run in Mosaic (compiled) mode on TPU devices and in
interpreter mode everywhere else.  ``jax.default_backend()`` is the
wrong signal when the *process* default is a TPU platform but the
kernels execute on explicitly provisioned CPU devices (the driver's
``dryrun_multichip`` on a virtual CPU mesh, exactly the round-1
failure mode): the decision must key off the devices that actually run
the kernel.

Resolution order in :func:`default_interpret`:

1. an explicit override installed with :func:`set_interpret` /
   :func:`interpret_hint` (mesh-aware callers install one around
   tracing);
2. the platform of ``devices`` when the caller can name them;
3. the process default backend (single-chip / implicit-placement path).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

_override: bool | None = None


def set_interpret(value: bool | None) -> None:
    """Force interpret mode on/off globally; ``None`` restores auto."""
    global _override
    _override = None if value is None else bool(value)


@contextmanager
def interpret_hint(value: bool):
    """Set the interpret default for the enclosed trace, unless an
    explicit override is already active (outer context wins)."""
    global _override
    if _override is not None:
        yield
        return
    _override = bool(value)
    try:
        yield
    finally:
        _override = None


def devices_interpret(devices) -> bool:
    """True iff the given devices are not TPU chips."""
    platforms = {getattr(d, "platform", None) for d in devices}
    platforms.discard(None)
    return bool(platforms) and "tpu" not in platforms


def default_interpret(devices=None) -> bool:
    """Resolve interpret mode for a kernel about to be traced."""
    if _override is not None:
        return _override
    if devices is not None:
        try:
            return devices_interpret(devices)
        except Exception:  # pragma: no cover - defensive
            pass
    return jax.default_backend() != "tpu"
