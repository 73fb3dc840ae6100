"""Standalone cost probe of the label-frame passes (take-rows +
segment moments) across implementations and halo counts.

The label-native detector's only non-elementwise work is the per-
particle frame-row selection ``table[label]`` and the per-halo moment
reduction — both one-hot MXU matmuls whose one-hot generation and dot
cost scale with ``N x H``.  At the bench shape (H=64) that pass is
~60% of the step; at the config-5 census shape (H=1536) it dominates.
This probe times, marginally (``bench.time_marginal``), per shape:

- ``direct``: the shipped one-hot matmul, f32 ``Precision.HIGHEST``
  (measured fastest of 5 variants in ``label_ablation.py`` at H=64)
- ``twolevel``: hi/lo label split — ``onehot(label // HL) [H/HL, N]``
  feeds a ``[C*HL, H/HL]`` re-tiled table dot, then the low part
  contracts on the VPU — one-hot work drops from ``H*N`` to
  ``(H/HL + C*HL) * N``
- moments variants of both.

Run: python benchmarks/frames_probe.py [--n 2097152] [--halos 64]
     [--hl 32]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


_CHUNK = 1 << 17  # bounds the [C*HL, chunk] twolevel intermediates


def take_rows_twolevel(table, idx, hl):
    import jax
    import jax.numpy as jnp

    h, c = table.shape
    hh = h // hl
    assert hh * hl == h
    # L[c*hl + lo, hi] = table[hi*hl + lo, c]
    L = jnp.transpose(
        table.astype(jnp.float32).reshape(hh, hl, c), (2, 1, 0)
    ).reshape(c * hl, hh)

    def body(ix):
        n = ix.shape[0]
        hi = ix // hl  # -1 -> -1 (floor div), zero column
        oh_hi = (hi[None, :]
                 == jnp.arange(hh, dtype=jnp.int32)[:, None])
        partial = jax.lax.dot_general(
            L, oh_hi.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [c*hl, n]
        lo = ix - hi * hl
        oh_lo = (lo[None, :]
                 == jnp.arange(hl, dtype=jnp.int32)[:, None])
        return jnp.sum(
            partial.reshape(c, hl, n)
            * oh_lo.astype(jnp.float32)[None], axis=1
        )  # [c, n]

    n = idx.shape[0]
    if n <= _CHUNK or n % _CHUNK:
        return body(idx)
    out = jax.lax.map(body, idx.reshape(n // _CHUNK, _CHUNK))
    return jnp.moveaxis(out, 0, 1).reshape(c, n)


def moments_twolevel(vals, idx, h, hl):
    import jax
    import jax.numpy as jnp

    c, n = vals.shape
    hh = h // hl

    def body(xs):
        ix, val = xs
        hi = ix // hl
        lo = ix - hi * hl
        oh_hi = (hi[None, :]
                 == jnp.arange(hh, dtype=jnp.int32)[:, None])
        oh_lo = (lo[None, :]
                 == jnp.arange(hl, dtype=jnp.int32)[:, None])
        # y[(c, lo), n] = vals[c, n] * oh_lo[lo, n] (fused dot operand)
        y = (val.astype(jnp.float32)[:, None, :]
             * oh_lo.astype(jnp.float32)[None]).reshape(
                 c * hl, ix.shape[0])
        return jax.lax.dot_general(
            y, oh_hi.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [c*hl, hh]

    if n <= _CHUNK or n % _CHUNK:
        mom2 = body((idx, vals))
    else:
        k = n // _CHUNK
        mom2 = jnp.sum(jax.lax.map(
            body,
            (idx.reshape(k, _CHUNK),
             jnp.moveaxis(vals.reshape(c, k, _CHUNK), 1, 0)),
        ), axis=0)
    return jnp.transpose(
        mom2.reshape(c, hl, hh), (2, 1, 0)
    ).reshape(h, c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--halos", type=int, default=64)
    ap.add_argument("--hl", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8,
                    help="passes chained per timed iteration")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from orbitanalysis_tpu.ops.label_step import (
        _segment_moments_matmul,
        _segment_moments_soa,
        take_rows_matmul,
        take_rows_soa,
    )

    N, H, HL = args.n, args.halos, args.hl
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(-1, H, size=N).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(H, 6)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(4, N)).astype(np.float32))

    # correctness first (on a small slice — the probe N may not fit
    # the twolevel intermediates unchunked)
    ns = min(N, 1 << 18)
    idx_s, vals_s = idx[:ns], vals[:, :ns]
    want = np.where(np.asarray(idx_s)[:, None] >= 0,
                    np.asarray(table)[np.maximum(np.asarray(idx_s), 0)],
                    0.0).T
    got = np.asarray(take_rows_twolevel(table, idx_s, HL))
    np.testing.assert_array_equal(got, want.astype(np.float32))
    m_ref = np.asarray(_segment_moments_soa(vals_s, idx_s, H))
    m_got = np.asarray(moments_twolevel(vals_s, idx_s, H, HL))
    # accumulation-order tolerance: ~N/H-element f32 sums
    np.testing.assert_allclose(m_got, m_ref, rtol=1e-3, atol=1e-2)
    B.log(f"correctness OK  (N={N} H={H} HL={HL})")

    reps = args.reps

    def timed(name, fn, *xs):
        def build(R):
            @jax.jit
            def f(sink, xs):
                def body(_, st):
                    sink, xs = st
                    for _ in range(reps):
                        out = fn(*xs)
                        s = jnp.sum(out)
                        sink = sink + s
                        # non-invariant: perturb idx-free operand
                        xs = (xs[0],
                              xs[1] + (s == -1.0).astype(jnp.float32))
                    return (sink, xs)

                sink, _ = jax.lax.fori_loop(0, R, body, (sink, xs))
                return sink
            return f

        best, t1 = B.time_marginal(build, jnp.float32(0), xs)
        per = best / reps
        B.log(f"{name:42s} {per*1e3:8.3f} ms/pass "
              f"({N / per:.3e} rows/s)  [t1 {t1*1e3:.1f} ms]")
        return per

    timed("take_rows direct aos f32",
          lambda i, t: take_rows_matmul(t, i, precision="f32"),
          idx, table)
    timed("take_rows direct soa f32",
          lambda i, t: take_rows_soa(t, i, precision="f32"),
          idx, table)
    timed("take_rows twolevel",
          lambda i, t: take_rows_twolevel(t, i, HL), idx, table)
    timed("moments direct aos f32",
          lambda i, v: _segment_moments_matmul(
              v.T, i, H, precision="f32"), idx, vals)
    timed("moments direct soa f32",
          lambda i, v: _segment_moments_soa(
              v, i, H, precision="f32"), idx, vals)
    timed("moments twolevel",
          lambda i, v: moments_twolevel(v, i, H, HL), idx, vals)


if __name__ == "__main__":
    main()
