"""Probe: XLA take_along_axis throughput at the fused-step shape.

Decides whether a host-computed churn alignment (searchsorted between
consecutive staged snapshots) + device gathers + the static detect
kernel can beat the in-kernel bitonic merge join (132 ms at 67M).
Protocol per BASELINE.md: amortized fetch-to-fetch over a lax.scan,
arrays passed as jit args (closure constants blow the tunnel's remote
compile size limit).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, P = 1020, 65536
ITERS = 8


def make_align(rng, churn=0.07):
    """Near-identity monotone alignment with ~churn fraction of -1s,
    like real membership turnover between consecutive sorted snapshots."""
    matched = rng.random((H, P)) > churn
    # positions of matches in the prev layout: cumulative count
    idx = np.cumsum(matched, axis=1) - 1
    return np.where(matched, idx, -1).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    align = jnp.asarray(make_align(rng))
    chans = tuple(
        jnp.asarray(rng.normal(size=(H, P)).astype(np.float32))
        for _ in range(6)
    )

    @jax.jit
    def gather6(align, chans):
        aidx = jnp.maximum(align, 0)
        matched = align >= 0

        def body(c, _):
            outs = [
                jnp.where(matched, jnp.take_along_axis(x, aidx, axis=-1),
                          0.0)
                for x in chans
            ]
            s = sum(o.sum() for o in outs)
            return c + s, None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    # warmup/compile
    float(gather6(align, chans))
    t0 = time.perf_counter()
    float(gather6(align, chans))
    dt = (time.perf_counter() - t0) / ITERS
    gb = 6 * H * P * 4 * 2 / 1e9  # read + write per channel
    print(f"take_along_axis x6 [H={H}, P={P}]: {dt*1e3:.2f} ms/iter "
          f"({gb/dt:.0f} GB/s effective)")

    # single-channel for the marginal cost
    @jax.jit
    def gather1(align, x):
        aidx = jnp.maximum(align, 0)

        def body(c, _):
            return c + jnp.take_along_axis(x, aidx, axis=-1).sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    float(gather1(align, chans[0]))
    t0 = time.perf_counter()
    float(gather1(align, chans[0]))
    dt1 = (time.perf_counter() - t0) / ITERS
    print(f"take_along_axis x1: {dt1*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
