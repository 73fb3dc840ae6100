"""Ablation probe INSIDE the split detect kernel
(``ops/pallas_label.detect_label_pallas``) at the bench shape.

The split full step measures 14.7 ms/scan; subtracting the measured
standalone passes (moments 0.31, frame rows 0.163, compaction 0.075
ms/snap) leaves ~0.68 ms/snap in the detect kernel against a ~0.2 ms
HBM streaming floor (76 B/particle at ~800 GB/s).  This probe times
the kernel with suspected hot spots stubbed out (trace-time
monkeypatches of the module attributes the kernel resolves late):

- ``full``: as shipped
- ``noacos``: the Cephes arccos polynomial replaced by identity
- ``nof16``: the integer RNE f32->f16 payload encoder replaced by a
  single shift
- ``stream``: a copy kernel with the same input/output streams — the
  DMA floor for this I/O shape

Run: python benchmarks/detect_probe.py [--variants full,stream]
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
    ap.add_argument("--variants", type=str, default=None)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench as B
    from orbitanalysis_tpu.ops import pallas_label as PL
    from orbitanalysis_tpu.ops import pallas_step as PS
    from orbitanalysis_tpu.ops.label_step import init_label_carry

    H, P, S = args.halos, args.cap, args.snaps
    N = H * P
    orbits = B.make_orbits(H, P, S, seed=0)
    _, _, _, _, _, member_seq = B.make_churn_sequence(
        orbits, 0.07, return_members=True)
    lab_seq, pos_l, vel_l, cen_l, nv_tot = B.make_label_sequence(
        orbits, member_seq)

    rw = 1 << 15
    R0 = N // rw
    d_label = B.put_chunked(lab_seq.reshape(S, R0, rw))
    d_pos = B.put_chunked(pos_l.reshape(S, 3, R0, rw))
    d_vel = B.put_chunked(vel_l.reshape(S, 3, R0, rw))
    # frame rows stand-in: reuse pos as the center rows + zero bulk
    # (same stream volume; the probe measures cost, not semantics)
    d_rows = jnp.concatenate(
        [d_pos[0], jnp.zeros_like(d_pos[0])], axis=0)    # [6, R, W]
    carry0 = init_label_carry(N, row_width=rw)
    box = 100.0
    B.log(f"data ready: N={N} S={S}")

    raw_call = PL._detect_label_call.__wrapped__

    def run_detect(name, patches):
        saved = [(mod, attr, getattr(mod, attr))
                 for mod, attr, _ in patches]
        for mod, attr, val in patches:
            setattr(mod, attr, val)
        try:
            hub = jnp.zeros((1, 1), jnp.float32)

            def build(R):
                @jax.jit
                def fn(_c, _a):
                    def body(i, st):
                        c, acc = st

                        def sbody(c, xs):
                            pos, vel, lab = xs
                            sv, rh, pk, pay, cnt = raw_call(
                                True, box, False, False, 8,
                                d_rows, lab, pos, vel,
                                c.lab_sv, c.rhat, c.packed, hub)
                            return c._replace(
                                lab_sv=sv, rhat=rh, packed=pk
                            ), (jnp.sum(cnt),
                                jnp.sum(pay.astype(jnp.float32)))
                        c, (cnt, pay) = jax.lax.scan(
                            sbody, c, (d_pos, d_vel, d_label))
                        acc = acc + jnp.sum(cnt) + jnp.sum(pay)
                        c = c._replace(packed=c.packed ^ (
                            acc == jnp.float32(-1.0)
                        ).astype(jnp.uint32))
                        return (c, acc)
                    _, acc = jax.lax.fori_loop(
                        0, R, body, (carry0, jnp.float32(0)))
                    return acc
                return fn

            best, t1 = B.time_marginal(build, None, None)
            B.log(f"{name:10s} {best*1e3/S:8.3f} ms/snap "
                  f"({best*1e3:7.2f} ms/scan)  [t1 {t1*1e3:.1f} ms]")
        finally:
            for mod, attr, val in saved:
                setattr(mod, attr, val)

    def run_stream(name):
        def copy_kernel(rows_ref, lab_ref, pos_ref, vel_ref, sv_ref,
                        rh_ref, pk_ref, osv_ref, orh_ref, opk_ref,
                        opay_ref, ocnt_ref):
            s = (rows_ref[0] + pos_ref[0] + pos_ref[1] + pos_ref[2]
                 + vel_ref[0] + vel_ref[1] + vel_ref[2] + rows_ref[3])
            osv_ref[:] = sv_ref[:] + lab_ref[:]
            orh_ref[:] = rh_ref[:]
            opk_ref[:] = pk_ref[:]
            opay_ref[:] = pltpu.bitcast(s, jnp.uint32)
            ocnt_ref[:] = jnp.sum(
                lab_ref[:], axis=1, keepdims=True)

        rb = 8
        spec1 = pl.BlockSpec((rb, rw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        spec3 = pl.BlockSpec((3, rb, rw), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)

        @functools.partial(jax.jit)
        def call(rows, lab, pos, vel, sv, rh, pk):
            return pl.pallas_call(
                copy_kernel,
                grid=(R0 // rb,),
                out_shape=(
                    jax.ShapeDtypeStruct((R0, rw), jnp.int32),
                    jax.ShapeDtypeStruct((3, R0, rw), jnp.float32),
                    jax.ShapeDtypeStruct((R0, rw), jnp.uint32),
                    jax.ShapeDtypeStruct((R0, rw), jnp.uint32),
                    jax.ShapeDtypeStruct((R0, 1), jnp.int32),
                ),
                in_specs=[
                    pl.BlockSpec((6, rb, rw), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    spec1, spec3, spec3, spec1, spec3, spec1,
                ],
                out_specs=(spec1, spec3, spec1, spec1,
                           pl.BlockSpec((rb, 1), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(rows, lab, pos, vel, sv, rh, pk)

        def build(R):
            @jax.jit
            def fn(_c, _a):
                def body(i, st):
                    c, acc = st

                    def sbody(c, xs):
                        pos, vel, lab = xs
                        sv, rh, pk, pay, cnt = call(
                            d_rows, lab, pos, vel,
                            c.lab_sv, c.rhat, c.packed)
                        return c._replace(
                            lab_sv=sv, rhat=rh, packed=pk
                        ), (jnp.sum(cnt),
                            jnp.sum(pay.astype(jnp.float32)))
                    c, (cnt, pay) = jax.lax.scan(
                        sbody, c, (d_pos, d_vel, d_label))
                    acc = acc + jnp.sum(cnt) + jnp.sum(pay)
                    c = c._replace(packed=c.packed ^ (
                        acc == jnp.float32(-1.0)).astype(jnp.uint32))
                    return (c, acc)
                _, acc = jax.lax.fori_loop(
                    0, R, body, (carry0, jnp.float32(0)))
                return acc
            return fn

        best, t1 = B.time_marginal(build, None, None)
        B.log(f"{name:10s} {best*1e3/S:8.3f} ms/snap "
              f"({best*1e3:7.2f} ms/scan)  [t1 {t1*1e3:.1f} ms]")

    cheap_f16 = lambda x: pltpu.bitcast(x, jnp.uint32) >> 17  # noqa
    variants = {
        "full": lambda: run_detect("full", []),
        "noacos": lambda: run_detect(
            "noacos", [(PS, "_acos_f32", lambda x: x)]),
        "nof16": lambda: run_detect(
            "nof16", [(PL, "f16_bits_rne", cheap_f16)]),
        "stream": lambda: run_stream("stream"),
    }
    sel = (args.variants.split(",") if args.variants
           else list(variants))
    for name in sel:
        variants[name]()


if __name__ == "__main__":
    main()
