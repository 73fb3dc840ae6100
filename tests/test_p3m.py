"""P3M force solver: Gaussian-split PM + erfc short range must
reproduce direct summation far more accurately than plain PM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbitanalysis_tpu.models.nbody import direct_forces
from orbitanalysis_tpu.models.p3m import make_p3m_force_fn
from orbitanalysis_tpu.models.pm import make_pm_force_fn


def _direct_periodic(pos, mass, box, softening, alpha=None, kmax=8):
    """Ewald-summation oracle: periodic gravity with the neutralizing
    background (the same convention as the PM solver's dropped k=0
    mode).  Real-space erfc part over nearest images + reciprocal sum.
    ``softening`` is applied to the real-space part only (it acts at
    short range)."""
    import math

    n = len(pos)
    if alpha is None:
        alpha = 3.0 / box  # erfc(3) ~ 2e-5: +-1-image real sum suffices
    acc = np.zeros((n, 3))
    # real space: erfc-screened interactions over +-1 images
    for ix in (-1, 0, 1):
        for iy in (-1, 0, 1):
            for iz in (-1, 0, 1):
                off = np.array([ix, iy, iz]) * box
                d = pos[:, None, :] - (pos[None, :, :] + off)
                r2 = (d * d).sum(-1) + softening**2
                r = np.sqrt(r2)
                from scipy.special import erfc
                mag = (
                    erfc(alpha * r) / np.maximum(r2, 1e-30)
                    + 2 * alpha / math.sqrt(math.pi)
                    * np.exp(-(alpha * r) ** 2) / np.maximum(r, 1e-30)
                )
                w = mass[None, :] * mag / np.maximum(r, 1e-30)
                if ix == iy == iz == 0:
                    np.fill_diagonal(w, 0.0)
                acc -= (w[..., None] * d).sum(axis=1)
    # reciprocal space
    ks = np.arange(-kmax, kmax + 1)
    for nx in ks:
        for ny in ks:
            for nz in ks:
                if nx == ny == nz == 0:
                    continue
                kvec = 2 * np.pi * np.array([nx, ny, nz]) / box
                k2 = kvec @ kvec
                if k2 > (2 * np.pi * kmax / box) ** 2:
                    continue
                coef = 4 * np.pi / box**3 * np.exp(
                    -k2 / (4 * alpha**2)
                ) / k2
                phase = pos @ kvec
                S = (mass * np.exp(-1j * phase)).sum()
                acc -= coef * np.imag(
                    np.exp(1j * phase)[:, None] * S
                ) * kvec[None, :]
    return acc


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    n, box = 400, 20.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return pos, mass, box


def test_p3m_beats_pm_against_direct(cloud):
    pos, mass, box = cloud
    soft = 0.05
    ref = _direct_periodic(pos.astype(np.float64),
                           mass.astype(np.float64), box, soft)
    scale = np.linalg.norm(ref, axis=1)

    p3m = make_p3m_force_fn(grid=32)
    a_p3m = np.asarray(jax.jit(
        lambda p, m: p3m(p, m, box_size=box, softening=soft)
    )(jnp.asarray(pos), jnp.asarray(mass)))
    assert not np.isnan(a_p3m).any()
    pm = make_pm_force_fn(grid=32)
    a_pm = np.asarray(jax.jit(
        lambda p, m: pm(p, m, box_size=box)
    )(jnp.asarray(pos), jnp.asarray(mass)))

    err_p3m = np.linalg.norm(a_p3m - ref, axis=1) / (scale + 1e-9)
    err_pm = np.linalg.norm(a_pm - ref, axis=1) / (scale + 1e-9)
    # P3M: ~1% force errors; plain PM is 10s of percent at close pairs
    assert np.median(err_p3m) < 0.02, np.median(err_p3m)
    assert np.quantile(err_p3m, 0.95) < 0.05, np.quantile(err_p3m, 0.95)
    assert np.median(err_p3m) < 0.25 * np.median(err_pm)


def test_p3m_close_pair_accuracy():
    """A pair well inside one PM cell: plain PM badly underestimates,
    P3M recovers the 1/r^2 force."""
    box, grid = 20.0, 16
    h = box / grid
    sep = 0.4 * h
    pos = np.array([[10.0, 10.0, 10.0],
                    [10.0 + sep, 10.0, 10.0]], np.float32)
    mass = np.ones(2, np.float32)
    p3m = make_p3m_force_fn(grid=grid)
    acc = np.asarray(p3m(jnp.asarray(pos), jnp.asarray(mass),
                         box_size=box, softening=0.0))
    expect = 1.0 / sep**2
    got = abs(acc[0, 0])
    assert abs(got - expect) / expect < 0.05, (got, expect)


def test_p3m_momentum_conservation(cloud):
    pos, mass, box = cloud
    p3m = make_p3m_force_fn(grid=32)
    acc = np.asarray(p3m(jnp.asarray(pos), jnp.asarray(mass),
                         box_size=box, softening=0.05))
    net = np.abs((np.asarray(mass)[:, None] * acc).sum(0))
    scale = np.abs(np.asarray(mass)[:, None] * acc).sum(0)
    assert np.all(net < 1e-3 * scale)


def test_p3m_through_integrator(cloud):
    from orbitanalysis_tpu.models.nbody import (
        NBodyState, OrbitNBodyConfig, simulate_with_tracking,
    )
    pos, mass, box = cloud
    rng = np.random.default_rng(3)
    st = NBodyState(
        jnp.asarray(pos),
        jnp.asarray(rng.normal(scale=0.2, size=pos.shape).astype(np.float32)),
        jnp.asarray(mass),
    )
    members = jnp.arange(len(pos), dtype=jnp.int32).reshape(1, -1)
    cfg = OrbitNBodyConfig(dt=0.05, n_steps=6, detect_every=2,
                           box_size=box, softening=0.05)
    _, tr, _ = simulate_with_tracking(
        st, members, cfg, force_fn=make_p3m_force_fn(grid=32)
    )
    assert np.asarray(tr.counts).sum() >= 0  # runs clean, no NaNs
    assert not np.isnan(np.asarray(tr.counts)).any()


@pytest.mark.slow
def test_sharded_p3m_matches_single_device(cloud):
    """Slab-resident distributed P3M (halo-exchanged short-range cells)
    == the single-device P3M force, on the virtual CPU mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    from orbitanalysis_tpu.models.pm_sharded import (
        make_slab_resident_pm_force_fn,
    )
    from orbitanalysis_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    n, box, grid = 4096, 20.0, 64
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    soft = 0.05

    ref = np.asarray(make_p3m_force_fn(grid, sigma_cells=1.5)(
        pos, mass, box_size=box, softening=soft))
    assert not np.isnan(ref).any()
    for d in (2, 8):
        f = make_slab_resident_pm_force_fn(
            make_mesh({"x": d}), grid, deconvolve=True,
            p3m_sigma_cells=1.5,
        )
        got = np.asarray(jax.jit(
            lambda p, m: f(p, m, box_size=box, softening=soft)
        )(pos, mass))
        assert not np.isnan(got).any(), d
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() < 1e-4 * scale, d
