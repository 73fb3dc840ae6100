"""Probe: event-extraction primitives at the bench shape [64, 32768].

The aligned engine's step cost is detection (XLA elementwise, HBM
speed) plus sparse event extraction; extraction is the single largest
remaining term (`benchmarks/aligned_ablation.py`).  This probe times
the shipping select-shift network against the XLA primitives that
could replace it, all fed the same ~1.7 %-density positional payload
plane (the real event rate of the bench's churn sequence):

  network  — ops.pallas_compact.compact_payload (shipping)
  topk2048 — lax.top_k on an inverted-position payload, K = capacity/16
             (descending payload order == ascending position order, so
             the result is the same front-packed-in-position-order list)
  topk512  — lax.top_k at a 4x smaller K (is top_k cost K-bound?)
  sortK    — full lax.sort, keep the top K columns

Measured on the session v5e (dispatch-floor-free marginal timing,
S=48 planes chained per pass):

  network  :  8.7 ms/scan   (11.6e9 elem/s)   <- shipping
  topk2048 : 67.1 ms/scan   ( 1.5e9 elem/s)
  topk512  : 65.9 ms/scan   ( 1.5e9 elem/s)   (not K-bound)
  sortK    : 27.7 ms/scan   ( 3.6e9 elem/s)

Conclusions: XLA's sort-based extraction primitives are 3-8x slower
than the log2(P)-pass select-shift network, and top_k's cost is not
K-bound, so shrinking event capacity buys nothing.  The network itself
is VPU-compute-bound (~9 vector ops x 15 passes over the plane), not
DMA-bound — dropping the redundant live flag from the shift channel
(two bit tests per pass instead of four) took it from 10.9 to
8.7 ms/scan; remaining headroom is op-count, not bandwidth.

Usage: python benchmarks/extract_probe.py [H P S K]
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

    from orbitanalysis_tpu.ops.pallas_compact import compact_payload

    argv = [int(a) for a in sys.argv[1:]]
    H, P, S, K = (argv + [64, 32768, 48, 2048][len(argv):])[:4]
    print(f"platform={jax.default_backend()}  H={H} P={P} S={S} K={K}",
          flush=True)

    rng = np.random.default_rng(0)
    sel = rng.random((S, H, P)) < 0.017
    pos = np.arange(P, dtype=np.uint32)
    ang = rng.integers(0, 1 << 15, size=(S, H, P)).astype(np.uint32)
    pay = jnp.asarray(np.where(sel, ((pos + 1) << 15) | ang, np.uint32(0)))
    ipay = jnp.asarray(
        np.where(sel, ((P - pos).astype(np.uint32) << 15) | ang,
                 np.uint32(0))
    )

    def make_build(extract):
        def build(R):
            @jax.jit
            def fn(c, planes):
                def body(_, st):
                    c, sink = st

                    def scan_body(cc, plane):
                        # xor the carry in so chained passes don't dedup
                        ev = extract(plane ^ cc)
                        return cc, jnp.sum(ev, dtype=jnp.uint32)

                    cc, sums = jax.lax.scan(scan_body, c, planes)
                    return (cc + jnp.uint32(1), sink + jnp.sum(sums))

                c, sink = jax.lax.fori_loop(0, R, body, (c, jnp.uint32(0)))
                return c, sink

            return fn

        return build

    def run(name, extract, planes):
        best, _ = time_marginal(make_build(extract), jnp.uint32(0),
                                planes, repeat=5, repeats=3)
        ups = S * H * P / best
        print(f"{name:10s}: {best*1e3:7.2f} ms/scan  "
              f"({ups/1e9:.2f}e9 elem/s)", flush=True)

    from orbitanalysis_tpu.ops.pallas_compact import (
        compact_payload_blocked,
    )

    run("network", lambda p: compact_payload(p, K), pay)
    run("blocked", lambda p: compact_payload_blocked(p, K), pay)
    run(f"topk{K}", lambda p: jax.lax.top_k(p, K)[0], ipay)
    run(f"topk{K//4}", lambda p: jax.lax.top_k(p, K // 4)[0], ipay)
    run("sortK", lambda p: jax.lax.sort(
        p, dimension=-1, is_stable=False)[..., -K:], ipay)


if __name__ == "__main__":
    main()
