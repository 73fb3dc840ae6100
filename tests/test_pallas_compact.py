"""Stable-compaction Pallas kernel vs NumPy boolean indexing."""

import numpy as np
import pytest

import jax.numpy as jnp

from orbitanalysis_tpu.ops.pallas_compact import compact_rows


@pytest.mark.parametrize("h,n,density_a,density_b", [
    (3, 512, 0.5, 0.02),
    (2, 256, 1.0, 0.0),
    (1, 1024, 0.03, 0.7),
])
def test_compact_two_groups(rng, h, n, density_a, density_b):
    sel_a = (rng.random((h, n)) < density_a).astype(np.int32)
    sel_b = (rng.random((h, n)) < density_b).astype(np.int32)
    vals = rng.integers(0, 2**31, size=(h, n), dtype=np.int64).astype(
        np.int32
    )
    fvals = rng.normal(size=(h, n)).astype(np.float32)

    (a_i, a_f), (b_i,) = compact_rows(
        jnp.asarray(sel_a), (jnp.asarray(vals), jnp.asarray(fvals)), n,
        jnp.asarray(sel_b), (jnp.asarray(vals),), 128,
    )
    a_i, a_f, b_i = map(np.asarray, (a_i, a_f, b_i))
    for r in range(h):
        ka = int(sel_a[r].sum())
        np.testing.assert_array_equal(a_i[r, :ka], vals[r, sel_a[r] == 1])
        np.testing.assert_array_equal(a_f[r, :ka], fvals[r, sel_a[r] == 1])
        kb = min(int(sel_b[r].sum()), 128)
        np.testing.assert_array_equal(
            b_i[r, :kb], vals[r, sel_b[r] == 1][:kb]
        )


def test_compact_adversarial_gaps(rng):
    """Patterns that stress the stale-copy hazard: alternating runs,
    all-dead prefixes, single survivors at the end."""
    n = 512
    rows = []
    r0 = np.zeros(n, np.int32); r0[-1] = 1
    r1 = np.zeros(n, np.int32); r1[::2] = 1
    r2 = np.ones(n, np.int32); r2[:300] = 0
    r3 = np.zeros(n, np.int32); r3[[0, 255, 256, 511]] = 1
    rows = np.stack([r0, r1, r2, r3])
    vals = np.arange(4 * n, dtype=np.int32).reshape(4, n)
    (got,), _ = compact_rows(
        jnp.asarray(rows), (jnp.asarray(vals),), n,
        jnp.asarray(rows), (), n,
    )
    got = np.asarray(got)
    for r in range(4):
        k = int(rows[r].sum())
        np.testing.assert_array_equal(got[r, :k], vals[r, rows[r] == 1])


@pytest.mark.parametrize("h,p,density,k", [
    (4, 512, 0.1, 512),
    (2, 1024, 0.9, 256),
    (3, 256, 0.0, 128),
])
def test_compact_payload_front_packs(rng, h, p, density, k):
    """Single-stream payload compaction: flagged entries (payload >=
    2^15) land front-packed in position order; selection derives from
    the payload itself — no flag stream."""
    from orbitanalysis_tpu.ops.pallas_compact import compact_payload

    sel = rng.random((h, p)) < density
    pos = np.broadcast_to(np.arange(p, dtype=np.uint32), (h, p))
    ang = rng.integers(0, 1 << 15, size=(h, p), dtype=np.int64).astype(
        np.uint32
    )
    payload = np.where(sel, ((pos + 1) << 15) | ang, np.uint32(0))
    got = np.asarray(compact_payload(jnp.asarray(payload), k))
    for r in range(h):
        want = payload[r, sel[r]]
        n = min(len(want), got.shape[1])
        np.testing.assert_array_equal(got[r, :n], want[:n])


def test_compact_payload_edges(rng):
    """Boundary payloads: event at position 0 (smallest key 1<<15),
    event at the last lane, max angle bits, fully dense row."""
    from orbitanalysis_tpu.ops.pallas_compact import compact_payload

    p = 256
    pay = np.zeros((3, p), np.uint32)
    pay[0, 0] = (1 << 15) | 0x7FFF        # pos 0, max angle
    pay[0, p - 1] = (np.uint32(p) << 15)  # last position, angle 0
    pay[1] = ((np.arange(p, dtype=np.uint32) + 1) << 15) | 1  # dense
    got = np.asarray(compact_payload(jnp.asarray(pay), p))
    np.testing.assert_array_equal(got[0, :2], [pay[0, 0], pay[0, p - 1]])
    np.testing.assert_array_equal(got[1], pay[1])
    # row 2 has no events; entries past the count are unspecified


@pytest.mark.parametrize("h,p,density,k,bcap", [
    (2, 2048, 0.015, 256, 16),   # typical sparse: blocked fast path
    (1, 2048, 0.0, 128, 16),     # empty
    (2, 2048, 0.5, 2048, 16),    # dense: every block overflows -> cond
    (3, 4096, 0.05, 512, 8),     # small block cap, mixed overflow odds
])
def test_compact_payload_blocked_matches_single_stage(
        rng, h, p, density, k, bcap):
    """The two-stage blocked network is output-identical to the exact
    single-stage network — including when blocks overflow ``block_cap``
    and the built-in ``lax.cond`` fallback reroutes the step."""
    from orbitanalysis_tpu.ops.pallas_compact import (
        compact_payload,
        compact_payload_blocked,
    )

    sel = rng.random((h, p)) < density
    pos = np.broadcast_to(np.arange(p, dtype=np.uint32), (h, p))
    ang = rng.integers(0, 1 << 15, size=(h, p), dtype=np.int64).astype(
        np.uint32
    )
    payload = np.where(sel, ((pos + 1) << 15) | ang, np.uint32(0))
    want = np.asarray(compact_payload(jnp.asarray(payload), k))
    got = np.asarray(
        compact_payload_blocked(jnp.asarray(payload), k, block_cap=bcap)
    )
    assert got.shape == want.shape
    for r in range(h):
        n = min(int(sel[r].sum()), got.shape[1])
        np.testing.assert_array_equal(got[r, :n], want[r, :n])


def test_compact_payload_blocked_clustered_overflow(rng):
    """A single 128-lane block holding more events than ``block_cap``
    (worst-case clustering) must still come out exact via the
    fallback."""
    from orbitanalysis_tpu.ops.pallas_compact import (
        compact_payload,
        compact_payload_blocked,
    )

    p = 2048
    pay = np.zeros((2, p), np.uint32)
    # 40 events inside one block on row 0; row 1 sparse
    pay[0, 300:340] = ((np.arange(300, 340, dtype=np.uint32) + 1) << 15) | 7
    pay[1, ::512] = ((np.arange(0, p, 512, dtype=np.uint32) + 1) << 15) | 3
    want = np.asarray(compact_payload(jnp.asarray(pay), 256))
    got = np.asarray(
        compact_payload_blocked(jnp.asarray(pay), 256, block_cap=16)
    )
    np.testing.assert_array_equal(got[0, :40], want[0, :40])
    np.testing.assert_array_equal(got[1, :4], want[1, :4])


def test_compact_payload_rejects_overwide_rows():
    """The single-word encoding holds pos + 1 <= 2**17 - 1; a row at the
    131072 fused ceiling would wrap the LAST position's payload to zero
    and silently drop its event (advisor round-2 high finding) — such
    rows must be rejected, not mis-compacted."""
    from orbitanalysis_tpu.ops.pallas_compact import (
        PAYLOAD_MAX_ROW,
        compact_payload,
    )

    assert PAYLOAD_MAX_ROW == (1 << 17) - 1
    pay = jnp.zeros((1, 1 << 17), jnp.uint32)
    with pytest.raises(ValueError, match="compact_payload_pair"):
        compact_payload(pay, 128)


@pytest.mark.parametrize("h,p,density,k", [
    (4, 512, 0.1, 512),
    (2, 1024, 0.9, 256),
    (3, 256, 0.0, 128),
])
def test_compact_payload_pair_front_packs(rng, h, p, density, k):
    """Two-stream positional compaction: selection derives from the
    position word (pos + 1, 0 = no event); the angle word rides along."""
    from orbitanalysis_tpu.ops.pallas_compact import compact_payload_pair

    sel = rng.random((h, p)) < density
    pos = np.broadcast_to(np.arange(p, dtype=np.uint32), (h, p))
    ang = rng.integers(0, 1 << 15, size=(h, p), dtype=np.int64).astype(
        np.uint32
    )
    posw = np.where(sel, pos + 1, np.uint32(0))
    angw = np.where(sel, ang, np.uint32(0))
    got_pos, got_ang = compact_payload_pair(
        jnp.asarray(posw), jnp.asarray(angw), k
    )
    got_pos, got_ang = np.asarray(got_pos), np.asarray(got_ang)
    for r in range(h):
        want_p = posw[r, sel[r]]
        want_a = angw[r, sel[r]]
        n = min(len(want_p), got_pos.shape[1])
        np.testing.assert_array_equal(got_pos[r, :n], want_p[:n])
        np.testing.assert_array_equal(got_ang[r, :n], want_a[:n])


def test_compact_payload_pair_last_position_131072():
    """The exact advisor scenario: an event at row position 131071 of a
    131072-wide row (pos + 1 = 2**17, unrepresentable in the single-word
    encoding) survives the pair kernel."""
    from orbitanalysis_tpu.ops.pallas_compact import compact_payload_pair

    p = 1 << 17
    posw = np.zeros((1, p), np.uint32)
    angw = np.zeros((1, p), np.uint32)
    posw[0, p - 1] = p          # pos + 1 = 131072
    angw[0, p - 1] = 0x7ABC
    posw[0, 7] = 8
    angw[0, 7] = 3
    got_pos, got_ang = compact_payload_pair(
        jnp.asarray(posw), jnp.asarray(angw), 128
    )
    np.testing.assert_array_equal(np.asarray(got_pos)[0, :2], [8, p])
    np.testing.assert_array_equal(np.asarray(got_ang)[0, :2], [3, 0x7ABC])
