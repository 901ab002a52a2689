"""Spectral primitives: Fermi factors and the fermionic free energy.

Rebuilds the energy pieces of the reference HMC Hamiltonian
(src/HMC.jl:12-41) with overflow-safe jax.nn primitives.  Particle–hole
symmetry (eigenvalues in ±E pairs) lets the fermion term be summed over
positive eigenvalues only, exactly as src/HMC.jl:21-27:

    E_fermion = − Σ_{E>0} [ βE + 2·log1pexp(−βE) ]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fermi_factors(evals, beta):
    """f(E) = 1/(1+e^{βE}) = logistic(−βE)  (src/Observables.jl:24-28)."""
    return jax.nn.sigmoid(-beta * evals)


def fermion_energy(evals, beta):
    """−Σ_{E>0}(βE + 2·softplus(−βE)); softplus == log1pexp."""
    x = beta * evals
    contrib = x + 2.0 * jax.nn.softplus(-x)
    return -jnp.sum(jnp.where(evals > 0, contrib, 0.0))


def boson_energy(delta, beta, J):
    """β/(2J) · Σ_bonds |Δ|²  (src/HMC.jl:32-33)."""
    return (beta / (2.0 * J)) * jnp.sum(jnp.abs(delta) ** 2)


def kinetic_energy(pi, mass):
    """Σ |π|² / (2m)  (src/HMC.jl:36-38)."""
    return jnp.sum(jnp.abs(pi) ** 2) / (2.0 * mass)


def total_energy(delta, pi, evals, beta, J, mass):
    """H_HMC = kinetic + boson + fermion  (src/HMC.jl:12-41)."""
    return (
        kinetic_energy(pi, mass)
        + boson_energy(delta, beta, J)
        + fermion_energy(evals, beta)
    )
