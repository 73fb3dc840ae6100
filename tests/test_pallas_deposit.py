"""Sorted-stream Pallas CIC deposit: parity with the scatter form,
scalar-mass contract, mass conservation, and the VMEM support policy.

The deposit is the reference-free part of the native integrator mode
(the reference assumes an external simulation code,
/root/reference/orbitanalysis/track_orbits_onthefly.py:8-58); parity is
therefore against this repo's own scatter form, which is itself
oracle-tested in tests/test_pm.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbitanalysis_tpu.models.pm import cic_deposit, select_depositor
from orbitanalysis_tpu.ops.pallas_deposit import (
    cic_deposit_sorted,
    pallas_deposit_supported,
)


def _seam_positions(n, grid, box, rng):
    """Random positions with the wrap/boundary corner cases pinned."""
    h = box / grid
    pos = rng.uniform(0, box, size=(n, 3)).astype(np.float32)
    pos[:8] = np.array(
        [
            [0.0, 0.0, 0.0],
            [box - 1e-4, box - 1e-4, box - 1e-4],
            [h / 2, h / 2, h / 2],            # exact cell center
            [h, h, h],                        # exact cell boundary
            [box - h / 2, 5.0, 5.0],          # wrap seam per axis
            [5.0, box - h / 2, 5.0],
            [5.0, 5.0, box - h / 2],
            [1e-6, box - 1e-6, box / 2],
        ],
        np.float32,
    )
    return pos


def test_sorted_deposit_matches_scatter(rng):
    n, grid, box = 4096, 16, 10.0
    pos = jnp.asarray(_seam_positions(n, grid, box, rng))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    ref = np.asarray(cic_deposit(pos, mass, grid, box))
    got = np.asarray(cic_deposit_sorted(pos, mass, grid, box))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_sorted_deposit_scalar_mass_and_conservation(rng):
    n, grid, box = 2048, 8, 4.0
    pos = jnp.asarray(rng.uniform(0, box, size=(n, 3)).astype(np.float32))
    ref = np.asarray(cic_deposit(pos, 1.5, grid, box))
    got = np.asarray(cic_deposit_sorted(pos, 1.5, grid, box))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # CIC conserves mass exactly up to f32 reassociation
    np.testing.assert_allclose(got.sum(), 1.5 * n, rtol=1e-5)


def test_sorted_deposit_ragged_chunk_padding(rng):
    """N not a multiple of the kernel chunk exercises the sentinel pad."""
    n, grid, box = 1000, 8, 4.0
    pos = jnp.asarray(rng.uniform(0, box, size=(n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    ref = np.asarray(cic_deposit(pos, mass, grid, box))
    got = np.asarray(cic_deposit_sorted(pos, mass, grid, box))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_deposit_support_policy():
    from orbitanalysis_tpu.ops.pallas_deposit import (
        pallas_deposit_slab_supported,
    )

    assert pallas_deposit_supported(256)
    assert not pallas_deposit_supported(512)
    # 512^3 is covered by the X-slab form (round-3 review item 3)
    assert pallas_deposit_slab_supported(512)
    # beyond int32 flat keys nothing sorted applies
    assert not pallas_deposit_slab_supported(1536)
    with pytest.raises(ValueError, match="slab"):
        cic_deposit_sorted(
            jnp.zeros((8, 3), jnp.float32), 1.0, 1536, 1.0
        )


def test_select_depositor_policy():
    assert select_depositor("scatter", 256) is cic_deposit
    assert select_depositor("sorted", 64) is cic_deposit_sorted
    # 512 routes through the slab form inside cic_deposit_sorted
    assert select_depositor("sorted", 512) is cic_deposit_sorted
    with pytest.raises(ValueError, match="slab-partitionable"):
        select_depositor("sorted", 1536)
    # auto never picks the Pallas path off-TPU
    assert select_depositor("auto", 512) is cic_deposit
    with pytest.raises(ValueError, match="deposit must be"):
        select_depositor("bogus", 64)


def test_slab_deposit_matches_scatter(rng):
    """The X-slab scan form is parity-exact with the scatter deposit
    on small grids (forced n_slabs), including the wrap seam and
    slab-boundary-straddling particles."""
    from orbitanalysis_tpu.ops.pallas_deposit import (
        cic_deposit_sorted_slabs,
    )

    n, grid, box = 4096, 16, 10.0
    h = box / grid
    pos = _seam_positions(n, grid, box, rng)
    # pin particles whose +x corner crosses each slab boundary
    # (slab_x = 4 at n_slabs=4): base x in {3, 7, 11, 15}
    for i, bx in enumerate((3, 7, 11, 15)):
        pos[8 + i] = [(bx + 0.9) * h, 5.0, 5.0]
    pos = jnp.asarray(pos)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    ref = np.asarray(cic_deposit(pos, mass, grid, box))
    for ns in (2, 4):
        got = np.asarray(cic_deposit_sorted_slabs(
            pos, mass, grid, box, n_slabs=ns
        ))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_slab_deposit_overflow_poisons(rng):
    """A slab whose population exceeds the static segment capacity
    must fail loud (NaN), not silently drop mass."""
    from orbitanalysis_tpu.ops.pallas_deposit import (
        cic_deposit_sorted_slabs,
    )

    n, grid, box = 4096, 16, 10.0
    # everything in slab 0 -> its segment (headroom * N / n_slabs)
    # overflows
    pos = jnp.asarray(
        rng.uniform(0, box / 8, size=(n, 3)).astype(np.float32)
    )
    got = np.asarray(cic_deposit_sorted_slabs(
        pos, 1.0, grid, box, n_slabs=4, headroom=1.0
    ))
    assert np.isnan(got).all()
