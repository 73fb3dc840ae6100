"""Cost ablation of the label-native detector step.

Times the full :func:`orbitanalysis_tpu.ops.label_step.make_label_orbit_step`
scan with each frames implementation ('matmul': the f32
``Precision.HIGHEST`` one-hot dot — the measured floor;
'matmul_bf16x3'/'soa'/'soa_bf16x3': exact-bf16x3-split and
SoA-oriented variants; 'pallas': the VMEM-blocked kernels of
``ops/pallas_frames.py``) and with the moments pass removed (catalog
bulk velocities), using the dispatch-floor-free marginal methodology
of ``bench.py`` (``time_marginal``: everything R-chained inside one
jit so the tunnel's fixed per-dispatch cost cancels).

Measured on the session v5e at N=2.1M x H=64 (ms/scan, S=12):
matmul 20.6 | soa 21.0 | soa_bf16x3 25.6 | matmul_bf16x3 28.3 |
pallas 31.1; catalog-bulk matmul 15.8.  The f32 one-hot matmul is the
floor: XLA fuses the one-hot generation into the MXU operand feed, so
neither the bf16x3 single-pass trick nor VMEM-blocking buys anything.

Run: python benchmarks/label_ablation.py [--halos 64] [--cap 32768]
     [--snaps 12]

``--snaps`` trades statistical weight against H2D time on slow
tunnels; marginal cost per scan is snap-count-proportional either way.
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
    ap.add_argument(
        "--frames", type=str, default=None,
        help="comma-separated frames impls to time (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from orbitanalysis_tpu.ops.label_step import (
        init_label_carry,
        make_label_orbit_step,
    )

    H, P, S = args.halos, args.cap, args.snaps
    N = H * P
    orbits = B.make_orbits(H, P, S, seed=0)
    _, _, _, _, _, member_seq = B.make_churn_sequence(
        orbits, 0.07, return_members=True)
    lab_seq, pos_l, vel_l, cen_l, nv_tot = B.make_label_sequence(
        orbits, member_seq)
    B.log(f"data ready: N={N} S={S}")

    # feed the step 2D [R, row_width] planes (the carry's layout):
    # 1D per-step slices would pay a relayout per plane per step
    rw0 = 1 << 15
    R0 = N // rw0
    d_label = B.put_chunked(lab_seq.reshape(S, R0, rw0))
    d_pos = B.put_chunked(pos_l.reshape(S, 3, R0, rw0))
    d_vel = B.put_chunked(vel_l.reshape(S, 3, R0, rw0))
    d_cen = jnp.asarray(cen_l)
    d_bulk = jnp.zeros((S, H, 3), jnp.float32)
    carry0 = init_label_carry(N)
    row_width = 1 << 15
    K = max(128, row_width // 16)
    box = 100.0
    B.log("device arrays staged")

    def run(name, frames, with_bulk):
        step = make_label_orbit_step(
            K, box_size=box, row_width=row_width, frames=frames)

        def build(R):
            @jax.jit
            def fn(c, arg):
                lab, pos, vel, cen, bulk = arg

                def body(_, st):
                    c, sink = st

                    def sbody(c, xs):
                        s_pos, s_vel, s_lab, s_cen, s_bulk = xs
                        return step(c, (
                            s_pos, s_vel, s_lab, s_cen,
                            s_bulk if with_bulk else None,
                            None, jnp.float32(0.0)))

                    c, ev = jax.lax.scan(
                        sbody, c, (pos, vel, lab, cen, bulk))
                    sink = (sink + jnp.sum(ev.count)
                            + jnp.sum(ev.angle))
                    # fold the event sink back into the carry so the
                    # fori_loop body is not loop-invariant
                    c = c._replace(
                        packed=c.packed ^ (sink == jnp.float32(-1.0))
                        .astype(jnp.uint32))
                    return (c, sink)

                _, sink = jax.lax.fori_loop(
                    0, R, body, (c, jnp.float32(0)))
                return sink
            return fn

        arg = (d_label, d_pos, d_vel, d_cen, d_bulk)
        best, t1 = B.time_marginal(build, carry0, arg)
        ups = S * nv_tot / best
        B.log(f"{name:34s} {best*1e3:8.2f} ms/scan "
              f"({ups:.3e} upd/s)  [t1 {t1*1e3:.1f} ms]")
        return best

    frames_list = (
        args.frames.split(",") if args.frames else
        ["matmul", "matmul_bf16x3", "soa", "soa_bf16x3",
         "pallas", "pallas2", "fused"])
    t = {}
    for fr in frames_list:
        t[fr] = run(f"full step, frames={fr}", fr, False)
    if args.frames is None:
        for fr in ("matmul", "soa"):
            run(f"catalog bulk, frames={fr}", fr, True)
    best = min(t, key=t.get)
    ref = "matmul" if "matmul" in t else frames_list[0]
    B.log(f"fastest full step: {best} "
          f"({t[ref] / t[best]:.2f}x over {ref})")


if __name__ == "__main__":
    main()
