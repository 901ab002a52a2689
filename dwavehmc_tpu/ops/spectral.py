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


def energy_difference(delta_n, pi_n, evals_n, delta_o, pi_o, evals_o,
                      beta, J, mass):
    """ΔH = H(new) − H(old), evaluated term-by-term as differences.

    Numerically far better conditioned than subtracting two large totals:
    the fermionic totals are O(β·N·|E|) while the per-level differences
    β(E_new − E_old) stay O(β·δE), so float32 Metropolis keeps ~N× more
    significant digits — essential on TPU at large β where the subtractive
    form cancels catastrophically.  Both spectra come from `eigh` (sorted
    ascending), so level-wise pairing is well defined.
    """
    d_kin = jnp.sum(jnp.abs(pi_n) ** 2 - jnp.abs(pi_o) ** 2) / (2.0 * mass)
    d_bos = (beta / (2.0 * J)) * jnp.sum(
        jnp.abs(delta_n) ** 2 - jnp.abs(delta_o) ** 2)

    # Fermionic term: g(βE) = βE + 2·softplus(−βE) = 2·log(2cosh(βE/2)) is
    # EVEN in E, so the Σ_{E>0} restriction equals the top half of the
    # sorted spectrum exactly (PH symmetry), independent of sign noise at
    # near-zero levels.  Compute the eigenvalue differences FIRST, so the
    # large βE magnitudes never enter a big cancelling sum.
    half = evals_n.shape[-1] // 2
    En = jnp.abs(evals_n[half:])
    Eo = jnp.abs(evals_o[half:])
    lin = beta * jnp.sum(En - Eo)
    soft = 2.0 * jnp.sum(jax.nn.softplus(-beta * En)
                         - jax.nn.softplus(-beta * Eo))
    d_fer = -(lin + soft)
    return d_kin + d_bos + d_fer
