"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU pods per SURVEY.md §4
("Distributed tier"): force the host platform and 8 virtual devices
*before* jax initializes.
"""

import os

# Default: force CPU even when the session environment pins a TPU
# platform (some TPU plugins, e.g. 'axon', override JAX_PLATFORMS at
# import time, so set the config explicitly as well).  Set
# ORBIT_TPU_TEST_PLATFORM=tpu to run the suite on the ambient device
# instead (single-chip: the distributed tier auto-skips).
_platform = os.environ.get("ORBIT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import signal  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    """Honor ``@pytest.mark.timeout(seconds)`` without the
    pytest-timeout plugin (not installable in this environment):
    a SIGALRM raised in the main thread fails the test in bounded
    time — the multihost process tests would otherwise hang CI
    indefinitely on a wedged ``jax.distributed`` rendezvous."""
    marker = item.get_closest_marker("timeout")
    if marker is None or not hasattr(signal, "SIGALRM"):
        return (yield)
    seconds = int(marker.args[0])

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded its timeout mark of {seconds}s"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
