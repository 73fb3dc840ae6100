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


_WORKER_COLLECTIVES = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
    KW = {"check_vma": False}
except ImportError:
    from jax.experimental.shard_map import shard_map
    KW = {"check_rep": False}

addr, pid = sys.argv[1], int(sys.argv[2])
from orbitanalysis_tpu.parallel import multihost

multihost.initialize(addr, 2, pid)
mesh = Mesh(np.array(jax.devices()), ("x",))
sharding = NamedSharding(mesh, P("x"))
local = np.full((4,), float(pid), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, (8,))

def f(x):
    other = jax.lax.ppermute(x, "x", [(0, 1), (1, 0)])
    tot = jax.lax.psum(jnp.sum(x), "x")
    return other + tot

y = jax.jit(
    shard_map(f, mesh=mesh, in_specs=P("x"), out_specs=P("x"), **KW)
)(garr)
mine = np.asarray(y.addressable_shards[0].data)
# my shard = other process's constant + global sum (0*4 + 1*4 = 4)
exp = (1.0 - pid) + 4.0
assert np.allclose(mine, exp), (pid, mine, exp)
print(f"WORKER{pid}_OK", flush=True)
"""


_WORKER_TRACKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

addr, pid, savefile, tests_dir = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
from orbitanalysis_tpu.parallel import multihost

multihost.initialize(addr, 2, pid)
assert jax.process_count() == 2

sys.path.insert(0, tests_dir)
from helpers import make_callbacks
from orbitanalysis_tpu import track_orbits
from orbitanalysis_tpu.models.synthetic import churn_snapshots
from orbitanalysis_tpu.parallel.mesh import make_mesh

box = 60.0
snaps, centers = churn_snapshots(4, 120, 6, box_size=box, seed=31)
regions, loader = make_callbacks(snaps, centers, box_size=box)
snap_nums = np.arange(6)
branches = np.tile(np.arange(4), (6, 1))

axis = os.environ.get("ORBIT_TEST_MESH_AXIS", "halos")
mesh = make_mesh({axis: 2}, jax.devices())
track_orbits(snap_nums, branches, regions, loader, savefile,
             mesh=mesh,
             join_impl="general" if axis == "halos" else "auto",
             checkpoint=True, verbose=False)
print(f"WORKER{pid}_OK", flush=True)
"""


@pytest.mark.timeout(300)
@pytest.mark.parametrize("axis", ["halos", "shards"])
def test_multihost_tracker_e2e(tmp_path, axis):
    """Full tracker over a 2-process mesh (halo-sharded and
    hash-sharded): single-writer savefile must be byte-identical to the
    single-process run (VERDICT r1 'multi-host savefile semantics')."""
    import h5py
    import numpy as np

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["ORBIT_TEST_MESH_AXIS"] = axis
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [root] + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    save_mp = str(tmp_path / "multi.h5")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_TRACKER, addr, str(pid), save_mp,
             os.path.join(root, "tests")],
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
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER{pid}_OK" in out

    # single-process reference run on the identical synthetic data —
    # for the hash axis, a single-process 2-shard mesh (same id%2
    # bucketing, same reduction partition => byte-identical)
    sys.path.insert(0, os.path.join(root, "tests"))
    import jax

    from helpers import make_callbacks

    from orbitanalysis_tpu import track_orbits
    from orbitanalysis_tpu.models.synthetic import churn_snapshots
    from orbitanalysis_tpu.parallel import make_mesh

    box = 60.0
    snaps, centers = churn_snapshots(4, 120, 6, box_size=box, seed=31)
    regions, loader = make_callbacks(snaps, centers, box_size=box)
    save_sp = str(tmp_path / "single.h5")
    kw = (
        dict(join_impl="general")
        if axis == "halos"
        else dict(mesh=make_mesh({"shards": 2}, jax.devices()[:2]))
    )
    track_orbits(np.arange(6), np.tile(np.arange(4), (6, 1)), regions,
                 loader, save_sp, checkpoint=True, verbose=False, **kw)

    with h5py.File(save_mp) as a, h5py.File(save_sp) as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            assert sorted(a[k].keys()) == sorted(b[k].keys()), k
            for ds in a[k]:
                assert np.array_equal(a[k][ds][:], b[k][ds][:]), (k, ds)
    # checkpoint sidecars identical too
    with h5py.File(save_mp + ".checkpoint") as a, \
         h5py.File(save_sp + ".checkpoint") as b:
        for ds in b:
            assert np.array_equal(a[ds][:], b[ds][:]), ds


@pytest.mark.timeout(120)
def test_multihost_shard_map_collectives(tmp_path):
    """ppermute + psum inside shard_map across two real processes —
    the collective substrate the distributed PM/P3M paths ride."""
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
            [sys.executable, "-c", _WORKER_COLLECTIVES, addr, str(pid)],
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
