"""Cumulative-stage cost probe of the label-native detector step.

The frame passes measured standalone (``benchmarks/frames_probe.py``)
cost only ~0.38 ms/step at the bench shape (take-rows 0.115 +
moments 0.261), yet the full step runs ~1.8 ms — so the dominant cost
is elsewhere.  This probe times the step's math cumulatively, each
stage adding one layer, with the marginal methodology of ``bench.py``:

- A  moments -> bulk                        (one one-hot MXU pass)
- B  A + take-rows + radial geometry        (second pass + elementwise)
- C  B + detect math + carry update         (flips, angles, new carry)
- D  C + payload build + per-row counts     (bitcasts, reshape)
- E  D + compact_payload                    (single-stage network)
- F  D + compact_payload_blocked            (two-stage blocked network)
- full  make_label_orbit_step as shipped

Run: python benchmarks/label_stage_probe.py [--halos 64] [--cap 32768]
     [--snaps 12]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from orbitanalysis_tpu.ops.label_step import (
        _frame_geometry,
        _segment_moments_matmul,
        init_label_carry,
        make_label_orbit_step,
        take_rows_matmul,
    )
    from orbitanalysis_tpu.ops.pallas_compact import (
        compact_payload,
        compact_payload_blocked,
    )
    from orbitanalysis_tpu.ops.pallas_step import _acos_f32

    H, P, S = args.halos, args.cap, args.snaps
    N = H * P
    orbits = B.make_orbits(H, P, S, seed=0)
    _, _, _, _, _, member_seq = B.make_churn_sequence(
        orbits, 0.07, return_members=True)
    lab_seq, pos_l, vel_l, cen_l, nv_tot = B.make_label_sequence(
        orbits, member_seq)
    B.log(f"data ready: N={N} S={S}")

    d_label = B.put_chunked(lab_seq)
    d_pos = B.put_chunked(pos_l)
    d_vel = B.put_chunked(vel_l)
    d_cen = jnp.asarray(cen_l)
    carry0 = init_label_carry(N)
    row_width = 1 << 15
    K = max(128, row_width // 16)
    box = 100.0
    R = N // row_width
    B.log("device arrays staged")

    def stage_step(level, extract):
        """A step function implementing the math up to ``level``."""

        def step(carry, xs):
            pos, vel, label, centers = xs
            valid = label >= 0
            lab_m = jnp.where(valid, label, -1)
            w = jnp.where(valid, 1.0, 0.0)
            mom = _segment_moments_matmul(
                jnp.stack([vel[0] * w, vel[1] * w, vel[2] * w, w],
                          axis=-1), lab_m, H)
            bulk = mom[:, :3] / jnp.maximum(mom[:, 3:4], 1e-30)
            if level == "A":
                return carry, jnp.sum(bulk)
            table = jnp.concatenate(
                [centers.astype(jnp.float32), bulk], axis=-1)
            rows = take_rows_matmul(table, lab_m)
            cpp = rows[:, :3].T
            bpp = rows[:, 3:].T
            rhat, vr = _frame_geometry(
                (pos[0], pos[1], pos[2]), (vel[0], vel[1], vel[2]),
                (cpp[0], cpp[1], cpp[2]), (bpp[0], bpp[1], bpp[2]),
                jnp.float32(0.0), box)
            if level == "B":
                return carry, jnp.sum(vr) + sum(jnp.sum(r) for r in rhat)
            vrb = ((vr < 0).astype(jnp.int32)
                   | ((vr > 0).astype(jnp.int32) << 1))
            prev_label = (carry.lab_sv & 0x0FFFFFFF) - 1
            prev_vrb = carry.lab_sv >> 28
            fresh = label != prev_label
            matched = valid & ~fresh & ((carry.packed >> 31) > 0)
            cosang = jnp.clip(
                carry.rhat[0] * rhat[0] + carry.rhat[1] * rhat[1]
                + carry.rhat[2] * rhat[2], -1.0, 1.0)
            dtheta = jnp.where(matched, _acos_f32(cosang), 0.0)
            pang = jax.lax.bitcast_convert_type(
                carry.packed & jnp.uint32(0x7FFFFFFF), jnp.float32)
            flip = ((prev_vrb & 1) > 0) & ((vrb & 2) > 0)
            apsis = matched & flip
            angle_acc = jnp.where(matched, pang + dtheta, 0.0)
            packed = jax.lax.bitcast_convert_type(
                jnp.where(apsis | ~valid, 0.0, angle_acc), jnp.uint32
            ) | (valid.astype(jnp.uint32) << 31)
            new_carry = carry._replace(
                lab_sv=jnp.where(
                    valid, (label + 1) | (vrb << 28), jnp.int32(0)),
                rhat=jnp.stack(rhat), packed=packed)
            if level == "C":
                return new_carry, jnp.sum(packed.astype(jnp.float32))
            pos_iota = jax.lax.broadcasted_iota(
                jnp.int32, (R, row_width), 1)
            ang15 = jax.lax.bitcast_convert_type(
                angle_acc.astype(jnp.float16), jnp.uint16
            ).astype(jnp.uint32).reshape(R, row_width)
            apsis_r = apsis.reshape(R, row_width)
            payload = jnp.where(
                apsis_r,
                ((pos_iota + 1).astype(jnp.uint32) << 15) | ang15,
                jnp.uint32(0))
            count = jnp.sum(apsis_r, axis=-1, dtype=jnp.int32)
            if level == "D":
                return new_carry, (jnp.sum(count).astype(jnp.float32)
                                   + jnp.sum(payload).astype(jnp.float32))
            evpay = extract(payload, K)
            return new_carry, (jnp.sum(count).astype(jnp.float32)
                               + jnp.sum(evpay).astype(jnp.float32))

        return step

    def run(name, step):
        def build(reps):
            @jax.jit
            def fn(c, arg):
                lab, pos, vel, cen = arg

                def body(_, st):
                    c, sink = st
                    c2, s = jax.lax.scan(
                        lambda cc, xs: step(
                            cc, (xs[0], xs[1], xs[2], xs[3])),
                        c, (pos, vel, lab, cen))
                    sink = sink + jnp.sum(s)
                    c2 = c2._replace(
                        packed=c2.packed ^ (sink == jnp.float32(-1.0))
                        .astype(jnp.uint32))
                    return (c2, sink)

                _, sink = jax.lax.fori_loop(
                    0, reps, body, (c, jnp.float32(0)))
                return sink
            return fn

        arg = (d_label, d_pos, d_vel, d_cen)
        best, t1 = B.time_marginal(build, carry0, arg)
        per = best / S
        B.log(f"{name:44s} {best*1e3:8.2f} ms/scan "
              f"({per*1e3:6.3f} ms/step)  [t1 {t1*1e3:.1f} ms]")
        return best

    run("A  moments+bulk", stage_step("A", None))
    run("B  A+take_rows+geometry", stage_step("B", None))
    run("C  B+detect+carry", stage_step("C", None))
    run("D  C+payload+count", stage_step("D", None))
    run("E  D+compact_payload", stage_step("E", compact_payload))
    run("F  D+compact_payload_blocked",
        stage_step("E", compact_payload_blocked))

    step = make_label_orbit_step(K, box_size=box, row_width=row_width)

    def full(carry, xs):
        pos, vel, label, cen = xs
        c, ev = step(carry, (pos, vel, label, cen, None, None,
                             jnp.float32(0.0)))
        return c, jnp.sum(ev.count).astype(jnp.float32) + jnp.sum(ev.angle)

    run("full shipped step", full)


if __name__ == "__main__":
    main()
