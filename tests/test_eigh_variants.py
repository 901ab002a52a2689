"""Real-embedding eigh must reproduce the complex solver: identical
spectrum, valid (phase-free) eigenvectors, identical physics downstream."""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, assemble_bdg, static_hamiltonian
from dwavehmc_tpu.ops.eigh import eigh_complex, eigh_real_embedding
from dwavehmc_tpu.ops.forces import pairing_correlations


def random_bdg(lat, seed=0):
    rng = np.random.default_rng(seed)
    disorder = jnp.asarray(rng.uniform(0, 0.5, lat.n_sites))
    delta = jnp.asarray(0.3 * (rng.normal(size=(lat.n_sites, 2))
                               + 1j * rng.normal(size=(lat.n_sites, 2))))
    Hs = static_hamiltonian(lat, 1.0, -0.35, -1.08, disorder)
    return assemble_bdg(lat, Hs, delta)


def test_same_spectrum():
    H = random_bdg(LatticeSpec(4, 5))
    e1, _ = eigh_complex(H)
    e2, _ = eigh_real_embedding(H)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-10)


def test_eigenvectors_valid():
    H = random_bdg(LatticeSpec(4, 4), seed=3)
    e, U = eigh_real_embedding(H)
    # H U = U diag(e)
    np.testing.assert_allclose(np.asarray(H @ U),
                               np.asarray(U * e[None, :]), atol=1e-9)
    # unitary
    d = H.shape[0]
    np.testing.assert_allclose(np.asarray(U.conj().T @ U), np.eye(d),
                               atol=1e-9)


def test_physics_downstream_phase_invariant():
    """Forces computed from either eigenbasis must agree (phase cancels in
    ρ = U f U†)."""
    lat = LatticeSpec(4, 4)
    H = random_bdg(lat, seed=7)
    beta = 5.0
    e1, U1 = eigh_complex(H)
    e2, U2 = eigh_real_embedding(H)
    P1 = np.asarray(pairing_correlations(lat, e1, U1, beta))
    P2 = np.asarray(pairing_correlations(lat, e2, U2, beta))
    np.testing.assert_allclose(P1, P2, atol=1e-9)


def test_vmappable():
    lat = LatticeSpec(4, 4)
    Hs = jnp.stack([random_bdg(lat, seed=s) for s in range(3)])
    e, U = jax.vmap(eigh_real_embedding)(Hs)
    assert e.shape == (3, lat.dim)
    assert U.shape == (3, lat.dim, lat.dim)
