"""Multi-host tier: the parallel.multihost glue exercised with two real
processes over jax.distributed (CPU backend), not just the single-host
identity path."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

addr, pid = sys.argv[1], int(sys.argv[2])
from orbitanalysis_tpu.parallel import multihost

multihost.initialize(addr, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert multihost.is_primary() == (pid == 0)

# per-process host data -> gathered everywhere, process order preserved
g = multihost.allgather_host(np.array([pid, 100 + pid]))
assert g.shape == (2, 2), g.shape
assert g[0, 0] == 0 and g[1, 0] == 1 and g[1, 1] == 101, g

b = multihost.broadcast_from_primary(np.array([7 * (pid + 1)]))
assert int(np.asarray(b)[0]) == 7, b  # primary's value everywhere

print(f"WORKER{pid}_OK", flush=True)
"""


@pytest.mark.timeout(120)
def test_multihost_two_processes(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=100)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER{pid}_OK" in out
