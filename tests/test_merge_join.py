"""Unit tier: the gather-free sort-merge join vs direct NumPy set logic."""

import numpy as np
import pytest

from orbitanalysis_tpu.ops.join import merge_join
from orbitanalysis_tpu.utils import INVALID_ID


def _random_rows(rng, n_rows, cap, fill_frac=0.7, id_dtype=np.int32):
    invalid = np.iinfo(id_dtype).max
    ids = np.full((n_rows, cap), invalid, dtype=id_dtype)
    for h in range(n_rows):
        n = rng.integers(0, int(cap * fill_frac) + 1)
        vals = rng.choice(np.arange(10 * cap), size=n, replace=False)
        ids[h, :n] = vals
    return ids


@pytest.mark.parametrize("id_dtype", [np.int32, np.int64])
def test_merge_join_matches_numpy(rng, id_dtype):
    cap = 64
    invalid = np.iinfo(id_dtype).max
    prev = _random_rows(rng, 6, cap, id_dtype=id_dtype)
    cur = _random_rows(rng, 6, cap, id_dtype=id_dtype)
    pv = rng.normal(size=(6, cap)).astype(np.float32)
    cv = rng.normal(size=(6, cap)).astype(np.float32)

    if id_dtype == np.int64:
        # 64-bit particle IDs require the x64 mode (documented)
        import jax
        with jax.enable_x64(True):
            mj = jax.tree.map(
                np.asarray,
                merge_join(prev, cur, invalid, values=((pv, cv),)),
            )
    else:
        mj = merge_join(prev, cur, invalid, values=((pv, cv),))
    m_prev = np.asarray(mj.matched_prev)
    m_cur = np.asarray(mj.matched_cur)
    slot = np.asarray(mj.prev_slot_of_cur)
    pv_at_cur = np.asarray(mj.to_cur[0])
    cv_at_prev = np.asarray(mj.to_prev[0])

    for h in range(6):
        prev_set = set(prev[h][prev[h] != invalid].tolist())
        cur_set = set(cur[h][cur[h] != invalid].tolist())
        for i in range(cap):
            pid = prev[h, i]
            if pid == invalid:
                assert not m_prev[h, i]
                continue
            if pid in cur_set:
                assert m_prev[h, i]
                j = int(np.where(cur[h] == pid)[0][0])
                assert cv_at_prev[h, i] == cv[h, j]
            else:
                assert not m_prev[h, i]
                assert cv_at_prev[h, i] == 0
        for j in range(cap):
            cid = cur[h, j]
            if cid == invalid:
                assert not m_cur[h, j]
                continue
            if cid in prev_set:
                assert m_cur[h, j]
                i = int(np.where(prev[h] == cid)[0][0])
                assert slot[h, j] == i
                assert pv_at_cur[h, j] == pv[h, i]
            else:
                assert not m_cur[h, j]
                assert slot[h, j] == -1
                assert pv_at_cur[h, j] == 0


def test_merge_join_compute_and_shared_channels(rng):
    """A compute callback with shared (to_prev, to_cur) output channels."""
    cap = 32
    prev = _random_rows(rng, 3, cap, fill_frac=1.0)
    cur = np.roll(prev, 5, axis=1)  # same ids, permuted slots
    pv = rng.normal(size=(3, cap)).astype(np.float32)
    cv = rng.normal(size=(3, cap)).astype(np.float32)

    def compute(left, this, matched):
        (a,) = left
        (b,) = this
        s = np.float32(0) + a + b  # sum of the matched pair's payloads
        return ((s, s),)  # same value to both layouts

    mj = merge_join(prev, cur, INVALID_ID, values=((pv, cv),), compute=compute)
    out_prev = np.asarray(mj.to_prev[0])
    out_cur = np.asarray(mj.to_cur[0])
    for h in range(3):
        for i in range(cap):
            pid = prev[h, i]
            if pid == INVALID_ID:
                continue
            j = int(np.where(cur[h] == pid)[0][0])
            expect = pv[h, i] + cv[h, j]
            assert out_prev[h, i] == pytest.approx(expect)
            assert out_cur[h, j] == pytest.approx(expect)


def test_merge_join_empty_and_disjoint(rng):
    cap = 16
    invalid = INVALID_ID
    empty = np.full((2, cap), invalid, np.int32)
    a = _random_rows(rng, 2, cap)
    mj = merge_join(empty, a, invalid, values=())
    assert not np.asarray(mj.matched_prev).any()
    assert not np.asarray(mj.matched_cur).any()
    # fully disjoint ids
    b = a.copy()
    b[b != invalid] += 10 * cap + 7
    mj = merge_join(a, b, invalid)
    assert not np.asarray(mj.matched_prev).any()
    assert not np.asarray(mj.matched_cur).any()


def test_merge_join_without_prev_slot(rng):
    a = _random_rows(rng, 2, 16)
    mj = merge_join(a, a, INVALID_ID, with_prev_slot=False)
    assert mj.prev_slot_of_cur is None
    valid = a != INVALID_ID
    assert np.array_equal(np.asarray(mj.matched_prev), valid)
