"""Pallas kernel tier: blocked direct forces in interpreter mode (the
compiled path is exercised on real TPU hardware by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbitanalysis_tpu.models.nbody import direct_forces
from orbitanalysis_tpu.ops.pallas_nbody import direct_forces_pallas


@pytest.mark.parametrize("n", [257, 1000])
def test_blocked_forces_match_gram(rng, n):
    pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    interpret = jax.default_backend() != "tpu"
    a1 = np.asarray(
        direct_forces_pallas(pos, mass, softening=0.1, interpret=interpret)
    )
    a2 = np.asarray(direct_forces(pos, mass, softening=0.1))
    rel = np.abs(a1 - a2) / (
        np.linalg.norm(a2, axis=1, keepdims=True) + 1e-3
    )
    assert rel.max() < 1e-3


def test_blocked_forces_zero_mass_padding_invariance(rng):
    """Appending zero-mass particles must not change existing forces."""
    n = 300
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    interpret = jax.default_backend() != "tpu"
    a1 = np.asarray(direct_forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), softening=0.1,
        interpret=interpret,
    ))
    pos2 = np.concatenate([pos, rng.normal(size=(50, 3)).astype(np.float32)])
    mass2 = np.concatenate([mass, np.zeros(50, np.float32)])
    a2 = np.asarray(direct_forces_pallas(
        jnp.asarray(pos2), jnp.asarray(mass2), softening=0.1,
        interpret=interpret,
    ))[:n]
    assert np.allclose(a1, a2, atol=1e-5)


def test_blocked_forces_periodic(rng):
    n, box = 400, 10.0
    pos = jnp.asarray(rng.uniform(0, box, size=(n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    interpret = jax.default_backend() != "tpu"
    a1 = np.asarray(direct_forces_pallas(
        pos, mass, softening=0.2, box_size=box, interpret=interpret
    ))
    a2 = np.asarray(direct_forces(pos, mass, softening=0.2, box_size=box))
    rel = np.abs(a1 - a2) / (
        np.linalg.norm(a2, axis=1, keepdims=True) + 1e-3
    )
    assert rel.max() < 1e-3
