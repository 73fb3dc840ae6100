"""A/B bench: general compact-event scan vs sorted-carry scan.

Times fetch-to-fetch (tunneled devices: block_until_ready is unreliable,
see BASELINE.md) at the headline bench shape.  Usage:

    python benchmarks/sorted_vs_general.py [H P S]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_sequence  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from orbitanalysis_tpu.engine.scan import (
        scan_events_compact,
        scan_events_sorted,
    )
    from orbitanalysis_tpu.ops.apsis import SnapshotBatch, init_carry
    from orbitanalysis_tpu.ops.sorted_step import init_sorted_carry

    if len(sys.argv) > 3:
        H, P, S = map(int, sys.argv[1:4])
    elif jax.devices()[0].platform == "tpu":
        H, P, S = 64, 32768, 16
    else:
        H, P, S = 8, 2048, 8
    K = max(128, P // 4)
    print(f"platform={jax.devices()[0].platform} H={H} P={P} S={S} K={K}")

    ids_seq, pos_seq, vel_seq, centers_seq = make_sequence(H, P, S)
    snaps = SnapshotBatch(
        ids=jnp.asarray(np.ascontiguousarray(ids_seq)),
        pos=jnp.asarray(pos_seq),
        vel=jnp.asarray(vel_seq),
        center=jnp.asarray(np.ascontiguousarray(centers_seq)),
        mass=None,
        bulk_vel=None,
        hubble_drag=jnp.zeros(S, dtype=jnp.float32),
    )

    def timeit(fn, c, label, repeats=5):
        out = fn(c, snaps)
        tot = int(np.asarray(out[0]))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = fn(c, snaps)
            _ = int(np.asarray(r[0]))
            best = min(best, time.perf_counter() - t0)
        ups = S * H * P / best
        print(f"{label:28s} {best*1e3:9.2f} ms/scan  {ups:.3e} up/s "
              f"({tot} events)")
        return best, tot

    impls = {}

    def run_general(c, s):
        _, (cnt, ids, angles) = scan_events_compact(
            c, s, K, mode="pericentric", box_size=100.0
        )
        return jnp.sum(cnt), jnp.max(cnt), ids, angles

    def run_sorted(c, s):
        _, (cnt, ids, angles) = scan_events_sorted(
            c, s, K, mode="pericentric", box_size=100.0
        )
        return jnp.sum(cnt), jnp.max(cnt), ids, angles

    t_g, ev_g = timeit(jax.jit(run_general), init_carry(H, P), "general")
    t_s, ev_s = timeit(jax.jit(run_sorted), init_sorted_carry(H, P),
                       "sorted-carry")
    assert ev_g == ev_s, (ev_g, ev_s)
    print(f"speedup: {t_g / t_s:.3f}x")

    for mi, ci in [("pallas", "lax_sort"), ("lax_sort", "pallas"),
                   ("pallas", "pallas")]:
        def run_pallas(c, s, mi=mi, ci=ci):
            _, (cnt, ids, angles) = scan_events_sorted(
                c, s, K, mode="pericentric", box_size=100.0,
                merge_impl=mi, compact_impl=ci,
            )
            return jnp.sum(cnt), jnp.max(cnt), ids, angles

        t_p, ev_p = timeit(jax.jit(run_pallas), init_sorted_carry(H, P),
                           f"merge={mi} compact={ci}")
        assert ev_g == ev_p, (ev_g, ev_p)
        print(f"  -> speedup vs general: {t_g / t_p:.3f}x")

    # staged ID-sorted rows: the cur-side sort leaves the step entirely
    from orbitanalysis_tpu.ops.sorted_step import presort_snapshot

    snaps_sorted = jax.tree.map(
        jnp.asarray, presort_snapshot(jax.tree.map(np.asarray, snaps))
    )

    def run_presorted(c, s):
        _, (cnt, ids, angles) = scan_events_sorted(
            c, s, K, mode="pericentric", box_size=100.0,
            merge_impl="pallas", compact_impl="pallas", cur_presorted=True,
        )
        return jnp.sum(cnt), jnp.max(cnt), ids, angles

    t_ps, ev_ps = timeit(jax.jit(run_presorted), init_sorted_carry(H, P),
                         "pallas kernels + presorted")
    assert ev_g == ev_ps, (ev_g, ev_ps)
    print(f"  -> speedup vs general: {t_g / t_ps:.3f}x")

    def run_fused(c, s):
        _, (cnt, ids, angles) = scan_events_sorted(
            c, s, K, mode="pericentric", box_size=100.0,
            fused=True, cur_presorted=True,
        )
        return jnp.sum(cnt), jnp.max(cnt), ids, angles

    t_f, ev_f = timeit(jax.jit(run_fused), init_sorted_carry(H, P),
                       "fused kernel + presorted")
    assert ev_g == ev_f, (ev_g, ev_f)
    print(f"  -> speedup vs general: {t_g / t_f:.3f}x")


if __name__ == "__main__":
    main()
