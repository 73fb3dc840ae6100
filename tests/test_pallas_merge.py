"""Bitonic-merge Pallas kernel vs lax.sort on the concatenation
(interpreter mode on CPU; compiled path exercised on TPU via
ORBIT_TPU_TEST_PLATFORM=tpu and benchmarks/sorted_vs_general.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbitanalysis_tpu.ops.pallas_merge import merge_rows, sort_descending_u32


def _random_halves(rng, h, p, n_payload):
    """Disjoint random uint32 keys split into two sorted halves."""
    keys = rng.choice(2**20, size=(h, 2 * p), replace=False).astype(
        np.uint32
    )
    prev_k = np.sort(keys[:, :p], axis=-1)
    cur_k = np.sort(keys[:, p:], axis=-1)[:, ::-1]  # descending
    def payloads(k):
        return tuple(
            (k * np.uint32(2654435761 + 97 * i)).astype(
                np.float32 if i % 2 else np.int32
            )
            for i in range(n_payload)
        )
    return (
        (jnp.asarray(prev_k),) + tuple(map(jnp.asarray, payloads(prev_k))),
        (jnp.asarray(cur_k),) + tuple(map(jnp.asarray, payloads(cur_k))),
    )


@pytest.mark.parametrize("h,p,n_payload", [(3, 256, 2), (2, 512, 5), (1, 128, 0)])
def test_merge_matches_lax_sort(rng, h, p, n_payload):
    prev_ops, cur_ops = _random_halves(rng, h, p, n_payload)
    got = merge_rows(prev_ops, cur_ops)
    exp = jax.lax.sort(
        tuple(
            jnp.concatenate([a, b], axis=1)
            for a, b in zip(prev_ops, cur_ops)
        ),
        dimension=-1,
        num_keys=1,
    )
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


def test_merge_with_duplicate_sentinels(rng):
    """Padding: both halves end in runs of the same sentinel key.  Keys
    are then not unique — the merged key sequence must still be sorted
    and the (key, payload) multiset preserved."""
    h, p = 2, 256
    sent = np.uint32(0xFFFFFFFE)
    prev_k = np.sort(
        rng.choice(2**20, size=(h, p), replace=False).astype(np.uint32),
        axis=-1,
    )
    cur_k = np.sort(
        (rng.choice(2**20, size=(h, p), replace=False) + 2**21).astype(
            np.uint32
        ),
        axis=-1,
    )[:, ::-1]
    prev_k[:, p // 2:] = sent
    cur_k[:, : p // 2] = sent  # descending: sentinels first
    pv = (prev_k * np.uint32(7)).astype(np.int32)
    cv = (cur_k * np.uint32(7)).astype(np.int32)
    k, v = merge_rows(
        (jnp.asarray(prev_k), jnp.asarray(pv)),
        (jnp.asarray(cur_k), jnp.asarray(cv)),
    )
    k, v = np.asarray(k), np.asarray(v)
    assert np.all(np.diff(k.astype(np.int64), axis=-1) >= 0)
    for row in range(h):
        np.testing.assert_array_equal(
            np.sort(v[row]), np.sort(np.concatenate([pv[row], cv[row]]))
        )


def test_sort_descending_u32(rng):
    k = jnp.asarray(
        rng.integers(0, 2**32, size=(3, 384), dtype=np.uint64).astype(
            np.uint32
        )
    )
    v = jnp.asarray(rng.normal(size=(3, 384)).astype(np.float32))
    ks, vs = sort_descending_u32(k, v)
    ks, vs = np.asarray(ks), np.asarray(vs)
    assert np.all(np.diff(ks.astype(np.int64), axis=-1) <= 0)
    order = np.argsort(-np.asarray(k).astype(np.int64), axis=-1, kind="stable")
    np.testing.assert_array_equal(
        vs, np.take_along_axis(np.asarray(v), order, axis=-1)
    )


@pytest.mark.slow
def test_fused_kernel_full_row_apsis_count():
    """Regression: a row where EVERY particle is matched and flips v_r
    drives the event-rank cumsum field to P << 16 = 2^31 at P=32768 —
    the packed dual cumsum must not overflow/sign-extend (uint32)."""
    import jax.numpy as jnp

    from orbitanalysis_tpu.ops.pallas_step import fused_join_detect

    h, p = 1, 32768
    ids = np.arange(p, dtype=np.uint32)
    key_prev = (ids << 1).reshape(h, p)
    slot = np.arange(p, dtype=np.int32).reshape(h, p)
    ones = np.ones((h, p), np.float32)
    zeros = np.zeros((h, p), np.float32)
    sv_prev = slot | (np.int32(1) << 24)   # v_r < 0 previously
    sv_cur = slot | (np.int32(2) << 24)    # v_r > 0 now -> pericenter
    key_cur_desc = ((ids << 1) | 1)[::-1].reshape(h, p)
    flip = lambda a: a[:, ::-1]

    packed, evk, evsv, evang, count = fused_join_detect(
        (jnp.asarray(key_prev), jnp.asarray(sv_prev), jnp.asarray(ones),
         jnp.asarray(zeros), jnp.asarray(zeros), jnp.asarray(zeros)),
        (jnp.asarray(key_cur_desc), jnp.asarray(flip(sv_cur)),
         jnp.asarray(flip(ones)), jnp.asarray(flip(zeros)),
         jnp.asarray(flip(zeros))),
        pericentric=True, invalid_id=np.iinfo(np.int32).max,
        event_capacity=p,
    )
    assert int(np.asarray(count)[0]) == p
    got = np.sort(np.asarray(evk)[0] >> 1)
    np.testing.assert_array_equal(got, ids)
    # all matched: every packed carry entry has the match bit set
    assert np.all(np.asarray(packed)[0] >> 31 == 1)
