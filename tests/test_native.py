"""Native tier: the C++ ragged packer vs the NumPy reference path."""

import numpy as np
import pytest

from orbitanalysis_tpu import native
from orbitanalysis_tpu.utils import INVALID_ID


@pytest.fixture(scope="module")
def lib():
    if native.ensure() is None:
        pytest.skip("no C++ toolchain available")
    return native


@pytest.mark.parametrize("dtype,elem", [
    (np.int32, ()), (np.float32, ()), (np.float32, (3,)), (np.int64, ()),
])
def test_native_pack_matches_numpy(lib, rng, dtype, elem):
    lens = np.array([5, 0, 900, 37, 128, 1])
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    total = int(lens.sum())
    shape = (total,) + elem
    if np.issubdtype(dtype, np.integer):
        values = rng.integers(0, 1 << 20, size=shape).astype(dtype)
        fill = INVALID_ID
    else:
        values = rng.normal(size=shape).astype(dtype)
        fill = 0.0
    rows = np.array([0, 2, 1, 5, 3, 4])
    cap = 1024

    got = lib.pack_ragged_native(values, offsets, 6, cap, rows, fill)
    assert got is not None

    out_shape = (6, cap) + elem
    expect = np.full(out_shape, fill, dtype=dtype)
    for b in range(6):
        expect[rows[b], : lens[b]] = values[offsets[b]: offsets[b] + lens[b]]
    assert np.array_equal(got, expect)


def test_padding_dispatches_to_native_above_threshold(lib, rng):
    from orbitanalysis_tpu.utils.padding import pack_ragged

    n = 600_000  # > 1 MiB of float32 -> native path
    lens = np.array([n // 2, n // 2])
    offsets = np.array([0, n // 2])
    values = rng.normal(size=n).astype(np.float32)
    out = pack_ragged(values, offsets, 2, n // 2 + 128, fill=0.0)
    assert np.array_equal(out[0, : n // 2], values[: n // 2])
    assert np.array_equal(out[1, : n // 2], values[n // 2:])
    assert np.all(out[:, n // 2:] == 0)
