"""Phase-split probe of the label-native step at the bench shape.

Times each device phase of the label step separately and marginally
(``bench.time_marginal`` — R-chained in one jit so the tunnel's fixed
dispatch cost cancels):

- ``moments``: the per-halo [H, 4] moment reduction (one-hot MXU)
- ``frames(pallas2)``: frame-row selection via the blocked bf16x3
  Pallas kernel + the XLA detect/carry chain
- ``fused``: the single-pass fused detect kernel
  (``ops/pallas_label.fused_label_detect``)
- ``compact``: the blocked payload compaction network

The sum of the phases should reconstruct the full-step cost measured
by ``benchmarks/label_ablation.py``; any residual is XLA glue.

Run: python benchmarks/label_phase_probe.py [--halos 64] [--cap 32768]
     [--snaps 12] [--phases moments,fused,...]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--halos", type=int, default=64)
    ap.add_argument("--cap", type=int, default=32768)
    ap.add_argument("--snaps", type=int, default=12)
    ap.add_argument("--phases", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from orbitanalysis_tpu.ops.label_step import (
        init_label_carry,
    )

    H, P, S = args.halos, args.cap, args.snaps
    N = H * P
    orbits, _churn, member_seq = B.make_churn_workload(H, P, S, seed=0)
    lab_seq, pos_l, vel_l, cen_l, nv_tot = B.make_label_sequence(
        orbits, member_seq)
    B.log(f"data ready: N={N} S={S} nv={nv_tot}")

    rw = 1 << 15
    R0 = N // rw
    d_label = B.put_chunked(lab_seq.reshape(S, R0, rw))
    d_pos = B.put_chunked(pos_l.reshape(S, 3, R0, rw))
    d_vel = B.put_chunked(vel_l.reshape(S, 3, R0, rw))
    d_cen = jnp.asarray(cen_l)
    carry0 = init_label_carry(N, row_width=rw)
    box = 100.0
    B.log("device arrays staged")

    data = (d_label, d_pos, d_vel, d_cen)

    def time_phase(name, build, c0=None):
        # device arrays ride the `snaps` argument (NOT closures: the
        # axon remote-compile inlines closed-over arrays as constants
        # and rejects the multi-hundred-MB request bodies, HTTP 413)
        best, t1 = B.time_marginal(
            build, carry0 if c0 is None else c0, data)
        B.log(f"{name:28s} {best*1e3/S:8.3f} ms/snap "
              f"({best*1e3:7.2f} ms/scan)  [t1 {t1*1e3:.1f} ms]")
        return best

    results = {}

    def phase_moments():
        from orbitanalysis_tpu.ops.label_step import (
            _segment_moments_matmul,
        )

        def build(R):
            @jax.jit
            def fn(_c, a):
                dl, dp, dv, dc = a

                def body(i, acc):
                    def sbody(acc, xs):
                        vel, lab = xs
                        vals = jnp.concatenate([
                            vel.reshape(3, N),
                            jnp.ones((1, N), jnp.float32),
                        ], axis=0).T
                        m = _segment_moments_matmul(
                            vals, lab.reshape(N), n_halos=H)
                        return acc + jnp.sum(m), None
                    acc, _ = jax.lax.scan(
                        sbody, acc, (dv, dl))
                    return acc
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))
            return fn
        return build

    def phase_fused():
        from orbitanalysis_tpu.ops.pallas_label import (
            fused_label_detect,
        )

        def build(R):
            @jax.jit
            def fn(c0, a):
                dl, dp, dv, dc = a

                def body(i, st):
                    c, acc = st

                    def sbody(c, xs):
                        pos, vel, lab, cen = xs
                        table = jnp.concatenate(
                            [cen, jnp.zeros((H, 3), jnp.float32)],
                            axis=-1)
                        sv, rh, pk, pay, cnt = fused_label_detect(
                            table, lab, pos, vel,
                            c.lab_sv, c.rhat, c.packed,
                            jnp.float32(0.0), pericentric=True,
                            box_size=box)
                        return c._replace(
                            lab_sv=sv, rhat=rh, packed=pk
                        ), (jnp.sum(cnt), jnp.sum(pay))
                    c, (cnt, pay) = jax.lax.scan(
                        sbody, c, (dp, dv, dl, dc))
                    acc = acc + jnp.sum(cnt) + jnp.sum(
                        pay.astype(jnp.float32))
                    c = c._replace(
                        packed=c.packed ^ (acc == jnp.float32(-1.0))
                        .astype(jnp.uint32))
                    return (c, acc)
                _, acc = jax.lax.fori_loop(
                    0, R, body, (c0, jnp.float32(0)))
                return acc
            return fn
        return build

    def phase_frames_pallas2():
        from orbitanalysis_tpu.ops.pallas_frames import (
            frame_rows_bf16x3,
        )

        def build(R):
            @jax.jit
            def fn(_c, a):
                dl, dp, dv, dc = a

                def body(i, acc):
                    def sbody(acc, xs):
                        lab, cen = xs
                        table = jnp.concatenate(
                            [cen, jnp.zeros((H, 3), jnp.float32)],
                            axis=-1)
                        rows = frame_rows_bf16x3(
                            table, lab.reshape(N))
                        return acc + jnp.sum(rows), None
                    acc, _ = jax.lax.scan(
                        sbody, acc, (dl, dc))
                    return acc
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))
            return fn
        return build

    def phase_compact():
        from orbitanalysis_tpu.ops.pallas_compact import (
            compact_payload_blocked,
        )

        def build(R):
            @jax.jit
            def fn(_c, a):
                dl = a[0]
                pay0 = (dl[0] >= 62).astype(jnp.uint32) * jnp.uint32(
                    0x8001)

                def body(i, acc):
                    out = compact_payload_blocked(
                        pay0 ^ acc.astype(jnp.uint32), rw // 16)
                    return acc + jnp.sum(
                        out.astype(jnp.float32)) * 0
                return jax.lax.fori_loop(
                    0, R * S, body, jnp.float32(0))
            return fn
        return build

    def phase_step(frames, rhat_packed):
        # The full step with EVERY event output consumed (count,
        # index, angle) so nothing is DCE'd — the round-4 version
        # returned only ev.count from the scan body, which let XLA
        # drop the payload compaction and event materialization
        # entirely and over-stated the step by ~10% (round-4 review
        # item 2).  c0 rides time_marginal's carry argument, not a
        # closure (the axon remote compile inlines closed-over device
        # arrays as constants: HTTP 413 at larger shapes).
        from orbitanalysis_tpu.ops.label_step import (
            make_label_orbit_step,
        )

        step = make_label_orbit_step(
            rw // 16, box_size=box, row_width=rw, frames=frames,
            rhat_packed=rhat_packed)

        def build(R):
            @jax.jit
            def fn(c0, a):
                dl, dp, dv, dc = a

                def body(i, st):
                    c, acc = st

                    def sbody(c, xs):
                        pos, vel, lab, cen = xs
                        c, ev = step(
                            c, (pos, vel, lab, cen, None, None,
                                jnp.float32(0.0)))
                        return c, (
                            jnp.sum(ev.count),
                            jnp.sum(ev.angle)
                            + jnp.sum(ev.index.astype(jnp.float32)),
                        )
                    c, (cnt, snk) = jax.lax.scan(
                        sbody, c, (dp, dv, dl, dc))
                    acc = (acc + jnp.sum(cnt).astype(jnp.float32)
                           + jnp.sum(snk) * jnp.float32(1e-30))
                    c = c._replace(
                        packed=c.packed ^ (acc == jnp.float32(-1.0))
                        .astype(jnp.uint32))
                    return (c, acc)
                _, acc = jax.lax.fori_loop(
                    0, R, body, (c0, jnp.float32(0)))
                return acc
            return fn
        return build, init_label_carry(
            N, rhat_packed=rhat_packed, row_width=rw)

    phases = {
        "moments": phase_moments,
        "fused": phase_fused,
        "frames_pallas2": phase_frames_pallas2,
        "compact": phase_compact,
        "step_split": lambda: phase_step("split", False),
        "step_split_packed": lambda: phase_step("split", True),
    }
    sel = (args.phases.split(",") if args.phases
           else list(phases))
    for name in sel:
        made = phases[name]()
        if isinstance(made, tuple):
            results[name] = time_phase(name, made[0], c0=made[1])
        else:
            results[name] = time_phase(name, made)


if __name__ == "__main__":
    main()
