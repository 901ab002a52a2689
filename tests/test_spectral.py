"""Energy/Fermi-factor tests against brute-force oracles (src/HMC.jl:12-41)."""

import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import fermi_factors, fermion_energy, total_energy
from dwavehmc_tpu.ops.spectral import boson_energy, kinetic_energy


def ph_symmetric_spectrum(rng, n):
    E = np.sort(rng.uniform(0.05, 4.0, size=n))
    return np.sort(np.concatenate([E, -E]))


def test_fermi_factor_values():
    E = jnp.array([-2.0, 0.0, 2.0])
    f = np.asarray(fermi_factors(E, 1.5))
    np.testing.assert_allclose(f, 1.0 / (1.0 + np.exp(1.5 * np.asarray(E))), rtol=1e-12)


def test_fermion_energy_equals_full_logdet_sum():
    """PH symmetry: −Σ_{E>0}[βE + 2·log1pexp(−βE)] == −Σ_all log(1+e^{−βE})."""
    rng = np.random.default_rng(0)
    E = ph_symmetric_spectrum(rng, 40)
    beta = 3.7
    full = -np.sum(np.log1p(np.exp(-beta * E)))
    ours = float(fermion_energy(jnp.asarray(E), beta))
    np.testing.assert_allclose(ours, full, rtol=1e-12)


def test_fermion_energy_large_beta_no_overflow():
    rng = np.random.default_rng(1)
    E = ph_symmetric_spectrum(rng, 16)
    beta = 1e4
    ours = float(fermion_energy(jnp.asarray(E), beta))
    # at huge β, log1pexp(−βE) → 0 so E_f → −β Σ_{E>0} E
    np.testing.assert_allclose(ours, -beta * np.sum(E[E > 0]), rtol=1e-10)
    assert np.isfinite(ours)


def test_boson_and_kinetic_terms():
    rng = np.random.default_rng(2)
    delta = rng.normal(size=(10, 2)) + 1j * rng.normal(size=(10, 2))
    pi = rng.normal(size=(10, 2)) + 1j * rng.normal(size=(10, 2))
    beta, J, mass = 2.0, 0.8, 1.3
    np.testing.assert_allclose(
        float(boson_energy(jnp.asarray(delta), beta, J)),
        beta / (2 * J) * np.sum(np.abs(delta) ** 2), rtol=1e-12)
    np.testing.assert_allclose(
        float(kinetic_energy(jnp.asarray(pi), mass)),
        np.sum(np.abs(pi) ** 2) / (2 * mass), rtol=1e-12)


def test_total_energy_is_sum_of_parts():
    rng = np.random.default_rng(3)
    delta = jnp.asarray(rng.normal(size=(6, 2)) + 1j * rng.normal(size=(6, 2)))
    pi = jnp.asarray(rng.normal(size=(6, 2)) + 1j * rng.normal(size=(6, 2)))
    E = jnp.asarray(ph_symmetric_spectrum(rng, 12))
    beta, J, mass = 1.1, 0.8, 1.0
    tot = float(total_energy(delta, pi, E, beta, J, mass))
    parts = (float(kinetic_energy(pi, mass)) + float(boson_energy(delta, beta, J))
             + float(fermion_energy(E, beta)))
    np.testing.assert_allclose(tot, parts, rtol=1e-12)
