"""Ablation of the flagship aligned-scan step: where do the
milliseconds go at the bench shape?

The recorded headline (bench.py) times the full `scan_events_aligned`
sequence.  This script decomposes one scan into its cost layers on the
ambient device:

  floor    — cost of dispatching a trivial jit: the tunneled device
             charges a fixed ~25 ms per dispatch, non-amortizing, so
             every stage below is timed dispatch-floor-free via the
             marginal method (R chained in-jit passes, see
             bench.time_marginal)
  stream   — materialize-sum every staged input plane (ids, slot, pos,
             vel): the pure HBM-read floor for the staged payload at
             XLA streaming speed
  frame    — region_frame only (geometry incl. the bulk-velocity row
             reduction)
  detect   — full step minus the compaction kernel (count + carry
             update only; events never extracted)
  full     — the shipping step (detect + compact_events + finish)

Usage: python benchmarks/aligned_ablation.py [H P S]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    make_churn_workload,
    time_marginal,
)


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from orbitanalysis_tpu.engine.packing import stage_batch_aligned
    from orbitanalysis_tpu.ops.apsis import SnapshotBatch
    from orbitanalysis_tpu.ops.geometry import region_frame
    from orbitanalysis_tpu.ops.sorted_step import (
        init_aligned_carry,
        make_aligned_native_step,
    )
    from orbitanalysis_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    H, P, S = (int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 else (
        64, 32768, 48
    )
    updates = H * P * S
    log(f"platform={jax.devices()[0].platform}  H={H} P={P} S={S} "
        f"({updates/1e6:.0f}M particle-snapshots/scan)")

    # ---- the dispatch floor itself
    tiny = jax.jit(lambda x: x + 1)
    tiny(jnp.float32(0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(tiny(jnp.float32(0))))
        best = min(best, time.perf_counter() - t0)
    log(f"floor    : {best*1e3:7.1f} ms/dispatch (tunnel fixed cost — "
        "subtracted from everything below)")

    _, (ids_c, pos_c, vel_c, centers_c, n_valid), _ = (
        make_churn_workload(H, P, S)
    )
    snaps = SnapshotBatch(
        ids=np.ascontiguousarray(ids_c), pos=pos_c, vel=vel_c,
        center=np.ascontiguousarray(centers_c), mass=None, bulk_vel=None,
        hubble_drag=np.zeros(S, dtype=np.float32),
    )
    t0 = time.perf_counter()
    staged = stage_batch_aligned(snaps, soa=True)
    log(f"staging  : {time.perf_counter() - t0:7.1f} s host (overlapped "
        "with device compute by the tracker's prefetch pipeline)")
    dev = jax.tree.map(jnp.asarray, staged)
    carry0 = init_aligned_carry(H, P)
    K = max(128, P // 16)
    step = make_aligned_native_step(
        K, mode="pericentric", box_size=100.0, soa_batch=True
    )

    def measure(name, pass_fn, extra="", c0=None):
        """pass_fn(carry, acc, snaps) -> (carry, scalar); R-fold
        marginal.  ``acc`` is the running accumulator — stages whose
        real carry does not chain (stream/frame) must derive an input
        perturbation from it, else XLA hoists the whole pass out of the
        fori_loop (loop-invariant code motion) and the marginal reads
        ~0."""

        def build(R):
            @jax.jit
            def fn(c, s):
                def body(_, st):
                    c, acc = st
                    c, out = pass_fn(c, acc, s)
                    return (c, acc + out)
                _, acc = jax.lax.fori_loop(
                    0, R, body, (c, jnp.float32(1))
                )
                return acc
            return fn

        t, _ = time_marginal(build, c0 if c0 is not None else carry0,
                             dev)
        log(f"{name:9s}: {t*1e3:7.1f} ms/scan  "
            f"({updates/t/1e9:.2f}e9 upd/s{extra})")
        return t

    # ---- stream floor
    def stream(c, a, s):
        bump = jax.lax.bitcast_convert_type(a, jnp.int32) & jnp.int32(1)
        fbump = a * jnp.float32(1e-30)

        def body(acc, snap):
            tot = (
                jnp.sum((snap.ids + bump).astype(jnp.float32))
                + jnp.sum((snap.slot + bump).astype(jnp.float32))
                + jnp.sum(snap.pos + fbump) + jnp.sum(snap.vel + fbump)
            )
            return acc + tot, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), s)
        return c, acc

    bytes_read = S * H * P * (4 + 4 + 12 + 12)
    t = measure("stream", stream)
    log(f"          ({bytes_read/t/1e9:.0f} GB/s staged-payload read)")

    # ---- region_frame only
    def frame_only(c, a, s):
        fbump = a * jnp.float32(1e-30)

        def body(acc, snap):
            fr = region_frame(
                snap.pos + fbump, snap.vel + fbump,
                snap.ids != np.iinfo(np.int32).max,
                snap.center, box_size=100.0,
                hubble_drag=snap.hubble_drag, soa=True,
            )
            return acc + jnp.sum(fr.vrad) + jnp.sum(fr.rhat[0]), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), s)
        return c, acc

    measure("frame", frame_only)

    # ---- detect without compaction: the SHIPPING detect chain
    # (ops.sorted_step.aligned_detect_math — shared with the step so
    # this row cannot drift from it), skipping only the compaction
    # kernel and event postprocessing
    from orbitanalysis_tpu.ops.sorted_step import (
        AlignedCarry,
        aligned_detect_math,
    )

    INVALID = np.iinfo(np.int32).max
    n_events_detect = [None]

    def detect_only(c, a, s):
        del a  # the carry itself chains — no perturbation needed

        def body(carry, snap):
            valid_cur = snap.ids != INVALID
            fr = region_frame(
                snap.pos, snap.vel, valid_cur, snap.center,
                box_size=100.0, hubble_drag=snap.hubble_drag, soa=True,
            )
            (cur_key, cur_sv, _apsis, _angle_acc, packed, _ang15,
             count, _pos_iota) = aligned_detect_math(
                carry, valid_cur, snap.slot, fr, True, INVALID)
            nc = AlignedCarry(key=cur_key, sv=cur_sv, rhat=fr.rhat,
                              packed=packed)
            return nc, count
        fc, counts = jax.lax.scan(body, c, s)
        return fc, jnp.sum(counts).astype(jnp.float32)

    measure("detect", detect_only)
    # event count from one real pass (carry0 start)
    _, ev = jax.jit(detect_only)(carry0, jnp.float32(0), dev)
    n_events_detect[0] = int(np.asarray(ev))

    # ---- detect + payload word + blocked compaction, no event
    # postprocessing: isolates where the extract phase's cost sits
    # (payload gen is a few elementwise ops; the standalone compact
    # kernel is ~0.075 ms/call — anything beyond that in `full` is
    # XLA glue around the cond/compact boundary or the [H, K] event
    # where/slice postprocessing)
    from orbitanalysis_tpu.ops.pallas_compact import (
        compact_payload_blocked,
    )

    def make_detect_extract(with_compact):
        def fn(c, a, s):
            del a

            def body(carry, snap):
                valid_cur = snap.ids != INVALID
                fr = region_frame(
                    snap.pos, snap.vel, valid_cur, snap.center,
                    box_size=100.0, hubble_drag=snap.hubble_drag,
                    soa=True,
                )
                (cur_key, cur_sv, apsis, _angle_acc, packed, ang15,
                 count, pos_iota) = aligned_detect_math(
                    carry, valid_cur, snap.slot, fr, True, INVALID)
                payload = jnp.where(
                    apsis,
                    ((pos_iota + 1).astype(jnp.uint32) << 15) | ang15,
                    jnp.uint32(0),
                )
                if with_compact:
                    evpay = compact_payload_blocked(
                        payload, max(128, P // 16))
                    sink = jnp.sum(evpay.astype(jnp.float32))
                else:
                    sink = jnp.sum(payload.astype(jnp.float32))
                nc = AlignedCarry(key=cur_key, sv=cur_sv, rhat=fr.rhat,
                                  packed=packed)
                return nc, (count, sink)
            fc, (counts, sinks) = jax.lax.scan(body, c, s)
            return fc, (jnp.sum(counts).astype(jnp.float32)
                        + 0.0 * jnp.sum(sinks))
        return fn

    measure("det+pay", make_detect_extract(False))
    measure("det+cmp", make_detect_extract(True))

    # ---- full step (shipping path)
    def full(c, a, s):
        del a

        def body(carry, snap):
            carry, ev = step(carry, snap)
            sink = (jnp.sum(ev.ids.astype(jnp.float32))
                    + jnp.sum(ev.angles))
            if ev.slots is not None:
                sink = sink + jnp.sum(ev.slots.astype(jnp.float32))
            return carry, (ev.count, sink)
        fc, (cnt, sink) = jax.lax.scan(body, c, s)
        return fc, jnp.sum(cnt).astype(jnp.float32) + 0.0 * jnp.sum(sink)

    measure("full", full)
    _, ev_full = jax.jit(full)(carry0, jnp.float32(0), dev)
    assert n_events_detect[0] == int(np.asarray(ev_full)), \
        "ablation event mismatch"

    # ---- full step, octahedral-packed rhat carry (16 B/particle):
    # counts invariant by construction (vr signs never read the
    # carried rhat), carry traffic drops 16 B/particle-step
    step_p = make_aligned_native_step(
        K, mode="pericentric", box_size=100.0, soa_batch=True,
        rhat_packed=True,
    )
    carry0p = init_aligned_carry(H, P, rhat_packed=True)

    def full_packed(c, a, s):
        del a

        def body(carry, snap):
            carry, ev = step_p(carry, snap)
            sink = (jnp.sum(ev.ids.astype(jnp.float32))
                    + jnp.sum(ev.angles))
            return carry, (ev.count, sink)
        fc, (cnt, sink) = jax.lax.scan(body, c, s)
        return fc, jnp.sum(cnt).astype(jnp.float32) + 0.0 * jnp.sum(sink)

    measure("full(pkd)", full_packed, c0=carry0p)
    _, ev_p = jax.jit(full_packed)(carry0p, jnp.float32(0), dev)
    assert n_events_detect[0] == int(np.asarray(ev_p)), \
        "packed-carry event mismatch"
    log(f"events   : {n_events_detect[0]}")


if __name__ == "__main__":
    main()
