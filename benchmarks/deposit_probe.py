"""Probe: CIC-deposit strategies at config-4 scale (16.7M / 256^3).

The PM force step's floor is the mass deposit: 134M (= N x 8 corners)
f32 adds through XLA's per-element scatter engine (~11 ns/element,
`models/pm.py:cic_deposit` docstring).  The round-2 review prescribes a
sort-based deposit (counting sort by cell + segment reduction) or a
Pallas accumulation kernel.  This probe measures the primitive costs
that decide that design on the session TPU.

Measured on the session v5e (marginal, dispatch-floor-free; N = 2^22
particles, so the scatter forms push 8N = 33.5M elements):

  baseline    : 372 ms   (11.1 ns per scattered element)
  base-sorted : 371 ms   <- sorted indices do NOT help the engine
  sort-u32    : 1.4 ms   (4.2M)  TPU lax.sort is ~bandwidth-fast
  sort-2op    : 4.5 ms   (4.2M u32 key + f32 payload, unstable)
  sort-2op8N  : 73  ms   (33.5M key+payload: the counting-sort carrier)
  sort-kv     : 7.8 ms   (sort_key_val is stable -> 1.7x the 2-op form)
  seg-sum     : 369 ms   <- segment_sum lowers to the same scatter
  scatterN    : 37  ms   (4.2M sorted adds: still 8.8 ns/element)
  scat-drop8N : 260 ms   (33.5M lanes, 7/8 dropped: drop is NOT free —
                          7.7 ns per INPUT lane, so masked scatters
                          cannot stand in for compaction)
  cumsum8N    : 7.9 ms   (33.5M: prefix sums are ~free)
  logshift8N  : 10.2 ms  (33.5M, 10 masked shift-add passes: segmented
                          reduction of a sorted stream is ~free)

Conclusions: every path through the scatter engine pays ~8-11 ns per
input element regardless of sortedness, uniqueness, or drops, while
sort / cumsum / shift-networks run orders of magnitude faster.  The
deposit rebuild therefore sorts particles by cell once (2-op sort,
~30 ms at 16.7M) and hands the sorted stream to a Pallas kernel that
assembles the dense grid directly (ops/pallas_deposit.py) — no scatter
anywhere.

Usage: python benchmarks/deposit_probe.py [N_log2 G]
Env: DEPOSIT_PROBE_ONLY=tok1,tok2 runs the probes whose names contain
a token (e.g. DEPOSIT_PROBE_ONLY=sort).

  baseline    — shipping cic_deposit (8 scatter-adds of N elements)
  base-sorted — the same scatter fed cell-sorted particles (does the
                scatter engine reward locality?)
  sort-u32    — lax.sort of the [N] u32 cell keys alone
  sort-u64    — lax.sort of one packed u64 (cell key | quantized
                fractions) — the single-operand counting-sort carrier
  sort-kv     — lax.sort_key_val(u32 key, u32 iota)
  seg-sum     — jax.ops.segment_sum of the [N, 8] corner-weight rows
                with sorted keys + indices_are_sorted=True
  scatterN    — one scatter-add of N f32 into [G^3] at sorted unique-ish
                keys (the post-dedup write-back cost)
  scatterNrow — scatter-add of [N, 8] rows at N sorted base cells (the
                post-partial-dedup row write-back cost)

Usage: python benchmarks/deposit_probe.py [N_log2 G]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import time_marginal  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from orbitanalysis_tpu.models.pm import cic_deposit

    argv = [int(a) for a in sys.argv[1:]]
    n_log2, grid = (argv + [24, 256][len(argv):])[:2]
    n = 1 << n_log2
    box = 100.0
    print(f"platform={jax.default_backend()}  N=2^{n_log2}={n}  G={grid}",
          flush=True)

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, box, size=(n, 3)).astype(np.float32)
    mass = np.ones(n, np.float32)

    h = box / grid
    x = pos / h - 0.5
    i0 = np.mod(np.floor(x).astype(np.int64), grid)
    key = ((i0[:, 0] * grid + i0[:, 1]) * grid + i0[:, 2]).astype(np.uint32)
    order = np.argsort(key, kind="stable")
    pos_sorted = pos[order]
    key_sorted = key[order]
    frac = (x - np.floor(x)).astype(np.float32)
    fq = np.minimum((frac * 8192.0).astype(np.uint64), 8191)
    key64 = (
        (key.astype(np.uint64) << np.uint64(40))
        | (fq[:, 0] << np.uint64(27))
        | (fq[:, 1] << np.uint64(14))
        | (fq[:, 2] << np.uint64(1))
    )

    dev = jax.device_put
    jpos, jpos_s = dev(pos), dev(pos_sorted)
    jmass = dev(mass)
    jkey, jkey_s = dev(key), dev(key_sorted)
    jkey64 = dev(key64)
    jiota = dev(np.arange(n, dtype=np.uint32))
    w8 = rng.random((n, 8), dtype=np.float32)
    jw8 = dev(w8)
    vals = rng.random(n, dtype=np.float32)
    jvals = dev(vals)

    def probe(name, build, *args):
        best, _ = time_marginal(build, jnp.uint32(0), args, repeat=4,
                                repeats=3)
        print(f"{name:12s}: {best*1e3:8.1f} ms", flush=True)
        return best

    def chained(body):
        """build(R) -> jitted fn chaining R perturbed passes."""

        def build(R):
            @jax.jit
            def fn(c, args):
                def it(_, st):
                    c, sink = st
                    out = body(c, *args)
                    return c + jnp.uint32(1), sink + out
                c, sink = jax.lax.fori_loop(
                    0, R, it, (c, jnp.float32(0)))
                return c, sink
            return fn

        return build

    g3 = grid * grid * grid
    only = os.environ.get("DEPOSIT_PROBE_ONLY", "")

    def want(name):
        return not only or any(tok in name for tok in only.split(","))

    _probe = probe

    def probe(name, build, *args):  # noqa: F811
        if want(name):
            return _probe(name, build, *args)

    def dep(c, p, m):
        pp = p + jnp.float32(1e-6) * c.astype(jnp.float32)
        rho = cic_deposit(pp, m, grid, box)
        return jnp.sum(rho[0, 0])

    probe("baseline", chained(dep), jpos, jmass)
    probe("base-sorted", chained(dep), jpos_s, jmass)

    # consume the FULL sorted array (an xor-reduce over every element)
    # so XLA cannot legally rewrite sort+slice into a min-reduction
    def consume_u(out):
        return jax.lax.reduce(out, np.array(0, out.dtype),
                              jax.lax.bitwise_xor, (0,)).astype(jnp.float32)

    def s32(c, k):
        out = jax.lax.sort(k ^ c, dimension=0, is_stable=False)
        return consume_u(out)

    probe("sort-u32", chained(s32), jkey)

    def s64(c, k):
        out = jax.lax.sort(k ^ c.astype(jnp.uint64), dimension=0,
                           is_stable=False)
        return consume_u(out)

    probe("sort-u64", chained(s64), jkey64)

    # the expanded counting-sort carrier: 8N entries of
    # corner_cell<<24 | fixed-point weight (the deposit design point)
    key8 = np.repeat(key.astype(np.uint64), 8) << np.uint64(24)
    key8 |= rng.integers(0, 1 << 24, size=8 * n).astype(np.uint64)
    jkey8 = dev(key8)
    probe("sort-u64x8", chained(s64), jkey8)

    def skv(c, k, i):
        ks, vs = jax.lax.sort_key_val(k ^ c, i, dimension=0)
        return consume_u(ks) + consume_u(vs)

    probe("sort-kv", chained(skv), jkey, jiota)

    # 2-operand unstable sort (u32 key + f32 payload): the actual
    # counting-sort carrier (u64 needs x64 mode; sort_key_val is stable)
    def s2op(c, k, v):
        ks, vs = jax.lax.sort((k ^ c, v), dimension=0, num_keys=1,
                              is_stable=False)
        return consume_u(ks) + jnp.sum(vs[::65536])

    probe("sort-2op", chained(s2op), jkey, jvals)
    key8_32 = np.sort(rng.integers(0, g3, size=8 * n)).astype(np.uint32)
    vals8 = rng.random(8 * n, dtype=np.float32)
    probe("sort-2op8N", chained(s2op), dev(key8_32), dev(vals8))

    def seg(c, k, w):
        ww = w + jnp.float32(1e-9) * c.astype(jnp.float32)
        out = jax.ops.segment_sum(ww, k.astype(jnp.int32),
                                  num_segments=g3,
                                  indices_are_sorted=True)
        return jnp.sum(out[0])

    probe("seg-sum", chained(seg), jkey_s, jw8)

    def scat1(c, k, v):
        vv = v + jnp.float32(1e-9) * c.astype(jnp.float32)
        out = jnp.zeros(g3, jnp.float32).at[k.astype(jnp.int32)].add(
            vv, indices_are_sorted=True)
        return out[0]

    probe("scatterN", chained(scat1), jkey_s, jvals)

    def scat8(c, k, w):
        ww = w + jnp.float32(1e-9) * c.astype(jnp.float32)
        out = jnp.zeros((g3, 8), jnp.float32).at[k.astype(jnp.int32)].add(
            ww, indices_are_sorted=True)
        return out[0, 0]

    probe("scatterNrow", chained(scat8), jkey_s, jw8)

    # --- the sorted-dedup tail candidates, at the expanded 8N size ---
    n8 = 8 * n
    keyx = np.sort(rng.integers(0, g3, size=n8)).astype(np.int32)
    valx = rng.random(n8, dtype=np.float32)
    # 7/8 of lanes dropped: does FILL_OR_DROP skip cheaply?
    keyd = np.where(rng.random(n8) < 0.125, keyx, np.int32(g3 + 7))
    jkeyx, jvalx, jkeyd = dev(keyx), dev(valx), dev(keyd)

    def scat_drop(c, k, v):
        vv = v + jnp.float32(1e-9) * c.astype(jnp.float32)
        out = jnp.zeros(g3, jnp.float32).at[k].add(
            vv, indices_are_sorted=True, mode="drop")
        return out[0]

    probe("scat-drop8N", chained(scat_drop), jkeyd, jvalx)

    def csum(c, v):
        vv = v + jnp.float32(1e-9) * c.astype(jnp.float32)
        return jnp.cumsum(vv)[-1]

    probe("cumsum8N", chained(csum), jvalx)

    # within-row segmented suffix-sum (log-shift): rows of 1024 over the
    # sorted expanded stream; 10 shifted masked-add passes
    rows_c = 1024
    k2 = jnp.asarray(keyx.reshape(-1, rows_c))
    v2 = jnp.asarray(valx.reshape(-1, rows_c))

    def logshift(c, k, v):
        v = v + jnp.float32(1e-9) * c.astype(jnp.float32)
        sh = 1
        while sh < rows_c:
            ks = jnp.roll(k, -sh, axis=1)
            vs = jnp.roll(v, -sh, axis=1)
            v = v + jnp.where(ks == k, vs, 0.0)
            sh *= 2
        head = jnp.concatenate(
            [jnp.ones((k.shape[0], 1), bool),
             k[:, 1:] != k[:, :-1]], axis=1)
        return jnp.sum(jnp.where(head, v, 0.0)[0])

    probe("logshift8N", chained(logshift), k2, v2)

    # --- the shipped sorted-stream Pallas assembly (ops/pallas_deposit) ---
    from orbitanalysis_tpu.ops.pallas_deposit import (
        cic_deposit_sorted,
        pallas_deposit_supported,
    )

    if pallas_deposit_supported(grid):

        def dep_pallas(c, p, m):
            pp = p + jnp.float32(1e-6) * c.astype(jnp.float32)
            rho = cic_deposit_sorted(pp, m, grid, box)
            return jnp.sum(rho[0, 0])

        probe("pallas", chained(dep_pallas), jpos, jmass)

    # --- full PM force step, scatter vs pallas deposit ---
    from orbitanalysis_tpu.models.pm import pm_forces

    def force(depkind):
        def body(c, p, m):
            pp = p + jnp.float32(1e-6) * c.astype(jnp.float32)
            acc = pm_forces(pp, m, grid, box, deposit=depkind)
            return jnp.sum(acc[0])

        return body

    probe("force-scat", chained(force("scatter")), jpos, jmass)
    if pallas_deposit_supported(grid):
        probe("force-pallas", chained(force("sorted")), jpos, jmass)


if __name__ == "__main__":
    main()
