"""Unit tier: sorted-join ID matching vs direct NumPy set logic."""

import numpy as np
import pytest

from orbitanalysis_tpu.ops.join import gather_rows, match_ids, sort_rows
from orbitanalysis_tpu.utils import INVALID_ID

pytestmark = pytest.mark.smoke  # <60 s core tier


def _random_rows(rng, n_rows, cap, fill_frac=0.7):
    ids = np.full((n_rows, cap), INVALID_ID, dtype=np.int32)
    for h in range(n_rows):
        n = rng.integers(0, int(cap * fill_frac) + 1)
        vals = rng.choice(np.arange(10 * cap), size=n, replace=False)
        ids[h, :n] = vals
    return ids


def test_match_ids_against_numpy(rng):
    cap = 64
    a = _random_rows(rng, 8, cap)
    b = _random_rows(rng, 8, cap)
    sb = sort_rows(b)
    j = np.asarray(match_ids(a, sb, INVALID_ID))
    for h in range(8):
        for i in range(cap):
            if a[h, i] == INVALID_ID:
                assert j[h, i] == -1
            else:
                where = np.where(b[h] == a[h, i])[0]
                if len(where):
                    assert j[h, i] == where[0]
                else:
                    assert j[h, i] == -1


def test_match_roundtrip_identity(rng):
    cap = 128
    ids = _random_rows(rng, 4, cap, fill_frac=1.0)
    s = sort_rows(ids)
    j = np.asarray(match_ids(ids, s, INVALID_ID))
    valid = ids != INVALID_ID
    rows, cols = np.nonzero(valid)
    assert np.array_equal(j[rows, cols], cols)


def test_gather_rows_scalar_and_vector(rng):
    vals = rng.normal(size=(2, 8)).astype(np.float32)
    vecs = rng.normal(size=(2, 8, 3)).astype(np.float32)
    slots = np.array([[3, -1, 0, 7, 2, -1, 1, 4], [0, 1, 2, 3, 4, 5, 6, 7]],
                     dtype=np.int32)
    g = np.asarray(gather_rows(vals, slots))
    assert g[0, 1] == 0 and g[0, 5] == 0
    assert g[0, 0] == vals[0, 3]
    gv = np.asarray(gather_rows(vecs, slots))
    assert np.allclose(gv[0, 3], vecs[0, 7])
    assert np.allclose(gv[0, 1], 0)
    assert np.allclose(gv[1], vecs[1])


def test_empty_rows(rng):
    ids = np.full((3, 32), INVALID_ID, dtype=np.int32)
    s = sort_rows(ids)
    j = np.asarray(match_ids(ids, s, INVALID_ID))
    assert np.all(j == -1)
