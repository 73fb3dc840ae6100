"""A/B: the aligned step's detect_impl — XLA elementwise detect + the
3-stream compaction kernel ('xla') vs the 10-stream fused static detect
kernel ('pallas', `ops/pallas_step.py:fused_static_detect` native mode).

Why this exists: on the stable-layout (aligned) staging, detection has
no cross-lane dependency — it is purely elementwise — so the only work
that *needs* a Pallas kernel is the sparse event compaction.  XLA
streams elementwise passes at ~880 GB/s on v5e while any pallas_call is
bounded by the measured ~225 GB/s per-kernel DMA ceiling
(`benchmarks/dma_probe.py`), so moving detection out of the kernel
should approach a large fraction of the DMA-floor gap.

Usage:  python benchmarks/aligned_detect_ab.py [H P S]
Defaults: bench.py's headline shape (64 x 32768 x 48) plus a large
device-resident shape (510 x 65536 x 2, 33M particles) when it fits.
Timing is fetch-to-fetch on a scalar over a donated-carry lax.scan,
amortized over the snapshot axis (tunneled-TPU methodology, see
BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

# avoid THP direct-compaction stalls on numpy's madvised large
# allocations (see bench.py) - must precede the numpy import
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(H, P, S, churn=0.07, repeats=3):
    import jax
    import jax.numpy as jnp

    import bench
    from orbitanalysis_tpu.engine.packing import stage_batch_aligned
    from orbitanalysis_tpu.engine.scan import _with_drag_axis
    from orbitanalysis_tpu.ops.apsis import SnapshotBatch
    from orbitanalysis_tpu.ops.sorted_step import (
        init_aligned_carry,
        make_aligned_native_step,
    )

    ids, pos, vel, centers, n_valid = bench.make_sequence(
        H, P, S, seed=0, churn=churn
    )
    snaps = SnapshotBatch(
        ids=np.ascontiguousarray(ids), pos=pos, vel=vel,
        center=np.ascontiguousarray(centers), mass=None, bulk_vel=None,
        hubble_drag=np.zeros(S, np.float32),
    )
    t0 = time.perf_counter()
    staged = jax.tree.map(jnp.asarray, stage_batch_aligned(snaps, soa=True))
    print(f"  staging: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    K = max(128, P // 16)

    out = {}
    for impl in ("xla", "pallas"):
        step = make_aligned_native_step(
            K, box_size=100.0, soa_batch=True, detect_impl=impl
        )

        def body(c, s):
            c, ev = step(c, s)
            return c, (ev.count, ev.ids, ev.angles)

        def run(c, s):
            c, (cnt, i, a) = jax.lax.scan(body, c, _with_drag_axis(s))
            return jnp.sum(cnt), jnp.max(cnt), i, a

        fn = jax.jit(run)
        r = fn(init_aligned_carry(H, P), staged)
        events = int(np.asarray(r[0]))
        assert int(np.asarray(r[1])) <= K
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            n_ev = int(np.asarray(fn(init_aligned_carry(H, P), staged)[0]))
            best = min(best, time.perf_counter() - t0)
        ups = S * H * (n_valid or P) / best
        out[impl] = (ups, best, events)
        print(
            f"  detect_impl={impl:6s}: {ups:.3e} upd/s "
            f"({best * 1e3 / S:.2f} ms/step, {events} events)",
            file=sys.stderr,
        )
    assert out["xla"][2] == out["pallas"][2], "event counts diverge"
    return out


def main():
    import jax

    shapes = [(64, 32768, 48)]
    if jax.devices()[0].platform == "tpu":
        shapes.append((510, 65536, 2))
    else:
        shapes = [(8, 2048, 8)]
    if len(sys.argv) == 4:
        shapes = [tuple(int(x) for x in sys.argv[1:4])]
    for H, P, S in shapes:
        print(f"[H={H} P={P} S={S}] ({H * P / 1e6:.1f}M particles)",
              file=sys.stderr)
        r = measure(H, P, S)
        print(f"  speedup xla/pallas: "
              f"{r['xla'][0] / r['pallas'][0]:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
