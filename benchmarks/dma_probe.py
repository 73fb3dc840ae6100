"""DMA-bandwidth probe: pallas_call auto-pipeline vs manual async DMA.

Round-1 measured the pallas_call implicit input/output pipeline capping
at ~235 GB/s on this v5e while plain XLA elementwise runs ~880 GB/s
(README roadmap; memory: tpu-tunnel-measurement).  This probe measures,
on one chip, a streaming x+1 over a [R, 65536] f32 plane via:

  xla        jit(x + 1)                                (the speed of light)
  auto       pallas_call, grid over row blocks         (round-1 structure)
  manual-K   single-program kernel, inputs/outputs in HBM (`ANY`),
             K-deep rotating VMEM buffers with explicit make_async_copy
             in/out, compute overlapped

Timings are fetch-to-fetch over a lax.scan of ITERS steps (tunneled
devices: block_until_ready is unreliable, one-shot carries ~50 ms RTT).

Usage: python benchmarks/dma_probe.py [rows] [variant ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 65536  # one full f32 plane row: 256 KiB
ITERS = 8


def time_scan(fn, x, iters=ITERS):
    """Amortized per-iteration seconds for y = fn^iters(x)."""

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        # tiny fetch forces materialization (pytree-friendly)
        return sum(jnp.sum(leaf[0, :8]) for leaf in jax.tree.leaves(y))

    run(x)  # compile
    float(np.asarray(run(x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(x)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def xla_variant():
    return lambda x: x + 1.0


def auto_variant(block_rows=8):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def fn(x):
        r = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(r // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    return fn


def manual_variant(chunk_rows=16, n_buf=4):
    """HBM-resident input/output; explicit rotating-buffer DMA in/out."""

    def fn(x):
        r = x.shape[0]
        n_chunks = r // chunk_rows

        def kernel(x_hbm, o_hbm):
            def body(buf, in_sem, out_sem):
                def dma_in(slot, idx):
                    return pltpu.make_async_copy(
                        x_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                        buf.at[slot],
                        in_sem.at[slot],
                    )

                def dma_out(slot, idx):
                    return pltpu.make_async_copy(
                        buf.at[slot],
                        o_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                        out_sem.at[slot],
                    )

                for w in range(n_buf - 1):
                    if w < n_chunks:
                        dma_in(w, w).start()

                def loop(idx, _):
                    slot = jax.lax.rem(idx, n_buf)
                    nxt = idx + (n_buf - 1)

                    @pl.when(nxt < n_chunks)
                    def _():
                        nslot = jax.lax.rem(nxt, n_buf)
                        # the buffer being refilled finished its
                        # write-back n_buf iterations ago
                        @pl.when(nxt >= n_buf)
                        def _():
                            dma_out(nslot, nxt - n_buf).wait()

                        dma_in(nslot, nxt).start()

                    dma_in(slot, idx).wait()
                    buf[slot] = buf[slot] + 1.0
                    dma_out(slot, idx).start()
                    return ()

                jax.lax.fori_loop(0, n_chunks, loop, ())
                # drain the tail of in-flight write-backs
                for w in range(n_buf):
                    idx = n_chunks - n_buf + w
                    if idx >= 0:
                        dma_out(idx % n_buf, idx).wait()

            pl.run_scoped(
                body,
                buf=pltpu.VMEM((n_buf, chunk_rows, LANES), jnp.float32),
                in_sem=pltpu.SemaphoreType.DMA((n_buf,)),
                out_sem=pltpu.SemaphoreType.DMA((n_buf,)),
            )

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(x)

    return fn


def multi_variant(inner, n_planes=5):
    """n independent planes (a tuple carry) through ``inner`` in one
    jit — measures whether separate ops overlap their HBM streams (the
    round-1 ~880 GB/s XLA figure came from a 5-plane payload).  Input
    planes are [rows // n, LANES] so total traffic matches the single-
    plane variants."""

    def fn(xs):
        return tuple(inner(x) for x in xs)

    fn.n_planes = n_planes
    return fn


def split_variant(chunk_rows=32, n_buf=4, n_dma=1):
    """Separate in/out VMEM buffers (refill does not wait on the
    write-back of the same slot) and optionally ``n_dma`` concurrent
    DMAs per chunk over disjoint row halves (tests whether one DMA
    descriptor is the rate limit)."""

    def fn(x):
        r = x.shape[0]
        n_chunks = r // chunk_rows
        sub = chunk_rows // n_dma

        def kernel(x_hbm, o_hbm):
            def body(ibuf, obuf, in_sem, out_sem):
                def dma_in(slot, idx, d):
                    return pltpu.make_async_copy(
                        x_hbm.at[
                            pl.ds(idx * chunk_rows + d * sub, sub), :
                        ],
                        ibuf.at[slot, pl.ds(d * sub, sub)],
                        in_sem.at[slot, d],
                    )

                def dma_out(slot, idx, d):
                    return pltpu.make_async_copy(
                        obuf.at[slot, pl.ds(d * sub, sub)],
                        o_hbm.at[
                            pl.ds(idx * chunk_rows + d * sub, sub), :
                        ],
                        out_sem.at[slot, d],
                    )

                for w in range(n_buf - 1):
                    if w < n_chunks:
                        for d in range(n_dma):
                            dma_in(w, w, d).start()

                def loop(idx, _):
                    slot = jax.lax.rem(idx, n_buf)
                    nxt = idx + (n_buf - 1)

                    @pl.when(nxt < n_chunks)
                    def _():
                        nslot = jax.lax.rem(nxt, n_buf)
                        for d in range(n_dma):
                            dma_in(nslot, nxt, d).start()

                    for d in range(n_dma):
                        dma_in(slot, idx, d).wait()
                    # out slot safety: its previous write-back (chunk
                    # idx - n_buf) must have drained
                    @pl.when(idx >= n_buf)
                    def _():
                        for d in range(n_dma):
                            dma_out(slot, idx - n_buf, d).wait()

                    obuf[slot] = ibuf[slot] + 1.0
                    for d in range(n_dma):
                        dma_out(slot, idx, d).start()
                    return ()

                jax.lax.fori_loop(0, n_chunks, loop, ())
                for idx in range(max(0, n_chunks - n_buf), n_chunks):
                    for d in range(n_dma):
                        dma_out(idx % n_buf, idx, d).wait()

            pl.run_scoped(
                body,
                ibuf=pltpu.VMEM((n_buf, chunk_rows, LANES), jnp.float32),
                obuf=pltpu.VMEM((n_buf, chunk_rows, LANES), jnp.float32),
                in_sem=pltpu.SemaphoreType.DMA((n_buf, n_dma)),
                out_sem=pltpu.SemaphoreType.DMA((n_buf, n_dma)),
            )

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(x)

    return fn


VARIANTS = {
    "xla": xla_variant,
    "xla5": lambda: multi_variant(xla_variant()),
    "pallas5": lambda: multi_variant(auto_variant(8)),
    "man128x2": lambda: manual_variant(128, 2),
    "split32x4": lambda: split_variant(32, 4, 1),
    "dual32x4": lambda: split_variant(32, 4, 2),
    "quad64x2": lambda: split_variant(64, 2, 4),
    "auto8": lambda: auto_variant(8),
    "auto32": lambda: auto_variant(32),
    "man16x4": lambda: manual_variant(16, 4),
    "man32x4": lambda: manual_variant(32, 4),
    "man64x2": lambda: manual_variant(64, 2),
    "man64x4": lambda: manual_variant(64, 4),
    "man32x8": lambda: manual_variant(32, 8),
    "man8x8": lambda: manual_variant(8, 8),
}


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    names = sys.argv[2:] or list(VARIANTS)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(rows, LANES)).astype(np.float32)
    )
    nbytes = 2 * rows * LANES * 4  # read + write
    print(f"plane [{rows}, {LANES}] f32, {rows * LANES * 4 / 2**20:.0f} MiB")
    for name in names:
        fn = VARIANTS[name]()
        n_planes = getattr(fn, "n_planes", 0)
        xin = (
            tuple(
                x[i * (rows // n_planes):(i + 1) * (rows // n_planes)]
                for i in range(n_planes)
            )
            if n_planes
            else x
        )
        try:
            t = time_scan(fn, xin)
        except Exception as e:  # keep probing other variants
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)
            continue
        print(f"{name:10s} {t * 1e3:8.3f} ms  {nbytes / t / 1e9:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
