"""Decompose the aligned step's extract phase (round-5).

The round-5 ablation (shared shipping detect math) shows the extract
cost is NOT the compaction network alone:

    detect    8.4 ms/scan
    det+pay  13.9  (payload word generation:      +5.5)
    det+cmp  20.8  (blocked compaction in-scan:   +6.9 — the same
                    kernel standalone costs ~2.9 ms/scan)

This probe isolates the two surprises:

  d+ang15   detect + f16_bits_rne only (no payload word, no iota)
  d+iota    detect + payload word with ang15 = 0 (no f16 encode)
  d+pay     detect + the full payload word            (baseline)
  d+c1      det+pay + single-stage compact_payload    (cond-free)
  d+cb_nc   det+pay + blocked compaction WITHOUT the overflow
            lax.cond (calls the blocked kernel directly; exact for
            this workload, asserted)
  d+cb      det+pay + shipping compact_payload_blocked (with cond)

Usage: python benchmarks/extract_decomp_probe.py [H P S]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_churn_workload, time_marginal  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from orbitanalysis_tpu.engine.packing import stage_batch_aligned
    from orbitanalysis_tpu.ops.apsis import SnapshotBatch
    from orbitanalysis_tpu.ops.geometry import region_frame
    from orbitanalysis_tpu.ops.pallas_compact import (
        _compact_payload_blocked_call,
        compact_payload,
        compact_payload_blocked,
    )
    from orbitanalysis_tpu.ops.pallas_config import default_interpret
    from orbitanalysis_tpu.ops.pallas_label import f16_bits_rne
    from orbitanalysis_tpu.ops.sorted_step import (
        AlignedCarry,
        aligned_detect_math,
        init_aligned_carry,
    )
    from orbitanalysis_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    H, P, S = (int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 else (
        64, 32768, 48
    )
    updates = H * P * S
    log(f"platform={jax.devices()[0].platform}  H={H} P={P} S={S}")
    _, (ids_c, pos_c, vel_c, centers_c, n_valid), _ = (
        make_churn_workload(H, P, S)
    )
    snaps = SnapshotBatch(
        ids=np.ascontiguousarray(ids_c), pos=pos_c, vel=vel_c,
        center=np.ascontiguousarray(centers_c), mass=None, bulk_vel=None,
        hubble_drag=np.zeros(S, dtype=np.float32),
    )
    staged = stage_batch_aligned(snaps, soa=True)
    dev = jax.tree.map(jnp.asarray, staged)
    carry0 = init_aligned_carry(H, P)
    K = max(128, P // 16)
    INVALID = np.iinfo(np.int32).max

    def measure(name, pass_fn):
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

        t, _ = time_marginal(build, carry0, dev)
        log(f"{name:9s}: {t*1e3:7.1f} ms/scan  "
            f"({updates/t/1e9:.2f}e9 upd/s)")
        return t

    def make_variant(kind):
        barrier = kind.startswith("bar")

        def fn(c, a, s):
            del a

            def body(carry, snap):
                valid_cur = snap.ids != INVALID
                fr = region_frame(
                    snap.pos, snap.vel, valid_cur, snap.center,
                    box_size=100.0, hubble_drag=snap.hubble_drag,
                    soa=True,
                )
                (cur_key, cur_sv, apsis, angle_acc, packed, ang15,
                 count, pos_iota) = aligned_detect_math(
                    carry, valid_cur, snap.slot, fr, True, INVALID,
                    share_angles=barrier)
                posw = ((pos_iota + 1).astype(jnp.uint32) << 15)
                if kind == "ang15":
                    sink = jnp.sum(
                        jnp.where(apsis, ang15, jnp.uint32(0))
                        .astype(jnp.float32))
                    return (AlignedCarry(key=cur_key, sv=cur_sv,
                                         rhat=fr.rhat, packed=packed),
                            (count, sink, None))
                if kind == "iota":
                    sink = jnp.sum(
                        jnp.where(apsis, posw, jnp.uint32(0))
                        .astype(jnp.float32))
                    return (AlignedCarry(key=cur_key, sv=cur_sv,
                                         rhat=fr.rhat, packed=packed),
                            (count, sink, None))
                payload = jnp.where(
                    apsis, posw | ang15, jnp.uint32(0))
                ys_pay = None
                if kind in ("pay", "bar"):
                    sink = jnp.sum(payload.astype(jnp.float32))
                elif kind == "c1":
                    ev = compact_payload(payload, K)
                    sink = jnp.sum(ev.astype(jnp.float32))
                elif kind == "cb_nc":
                    r = P // 128
                    out, ov = _compact_payload_blocked_call(
                        16, K, default_interpret(),
                        payload.reshape(H, r, 128),
                    )
                    sink = (jnp.sum(out.astype(jnp.float32))
                            + jnp.sum((jnp.max(ov) > 16)
                                      .astype(jnp.float32)))
                elif kind in ("cb", "barcb"):
                    ev = compact_payload_blocked(payload, K)
                    sink = jnp.sum(ev.astype(jnp.float32))
                elif kind == "barpost":
                    sink = jnp.float32(0)
                    ys_pay = payload
                elif kind == "awk":
                    # the shipping aw kernel (payload built in-kernel)
                    from orbitanalysis_tpu.ops.pallas_compact import (
                        compact_angle_blocked,
                    )
                    aw = jax.lax.bitcast_convert_type(
                        angle_acc, jnp.uint32
                    ) | (apsis.astype(jnp.uint32) << 31)
                    ev = compact_angle_blocked(aw, K)
                    sink = jnp.sum(ev.astype(jnp.float32))
                elif kind.startswith("awg"):
                    # TIMING-ONLY grid-coarsening probe: fold `fold`
                    # halo rows into one kernel row (results are wrong
                    # — events cross row boundaries — but the DMA and
                    # network cost is representative); isolates the
                    # per-grid-step overhead hypothesis
                    from orbitanalysis_tpu.ops.pallas_compact import (
                        _compact_angle_blocked_call,
                    )
                    fold = int(kind[3:])
                    aw = jax.lax.bitcast_convert_type(
                        angle_acc, jnp.uint32
                    ) | (apsis.astype(jnp.uint32) << 31)
                    aw3 = aw.reshape(H // fold, (P * fold) // 128, 128)
                    out, ov = _compact_angle_blocked_call(
                        16, K, default_interpret(), aw3)
                    sink = (jnp.sum(out.astype(jnp.float32))
                            + jnp.sum(ov.astype(jnp.float32)))
                else:
                    raise ValueError(kind)
                nc = AlignedCarry(key=cur_key, sv=cur_sv, rhat=fr.rhat,
                                  packed=packed)
                return nc, (count, sink, ys_pay)
            fc, (counts, sinks, pays) = jax.lax.scan(body, c, s)
            sink = jnp.sum(sinks)
            if pays is not None:
                # ONE blocked compaction over the whole scan's stacked
                # payload planes: S*H rows through a single pallas
                # dispatch instead of S in-scan launches
                ev = compact_payload_blocked(
                    pays.reshape(S * H, P), K)
                sink = sink + jnp.sum(ev.astype(jnp.float32))
            return fc, (jnp.sum(counts).astype(jnp.float32)
                        + 0.0 * sink)
        return fn

    sel = sys.argv[4].split(",") if len(sys.argv) > 4 else [
        "ang15", "iota", "pay", "c1", "cb_nc", "cb"]
    for kind in sel:
        measure(f"d+{kind}", make_variant(kind))


if __name__ == "__main__":
    main()
