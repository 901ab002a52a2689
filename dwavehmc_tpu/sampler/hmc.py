"""Hybrid Monte Carlo sweep as a single jit-compiled pure function.

Rebuilds hmc_sweep! (src/HMC.jl:71-144) TPU-first:
 * the leapfrog loop is a ``lax.scan`` with static step count Nt,
 * Metropolis accept/reject is a ``jnp.where`` select on the carried
   (Δ, E, U) — no host round-trip and no backup copies (the reference
   copies a (2N)² matrix three times per sweep, src/HMC.jl:84-86,132-138),
 * randomness comes from a splittable per-chain PRNG key threaded through
   the state, so ensembles are seed-reproducible.

Leapfrog conventions match the reference exactly:
    π refresh:   Re π, Im π ~ N(0, m)                   (src/HMC.jl:51-61)
    Δ update:    Δ += dt·π/(2m)                         (src/HMC.jl:95-101)
    kicks:       half, (Nt−1) full, half                (src/HMC.jl:91-118)
    accept:      ΔH < 0 or u < exp(−ΔH); NaN ⇒ reject   (src/HMC.jl:128)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.bdg import assemble_bdg, diagonalize, static_hamiltonian
from ..models.lattice import LatticeSpec
from ..models.params import HMCState, ModelParams, complex_dtype_of
from ..ops.forces import hmc_forces
from ..ops.spectral import energy_difference, total_energy


class SweepInfo(NamedTuple):
    accepted: jax.Array   # bool
    dH: jax.Array         # energy change of the proposed trajectory
    H_old: jax.Array
    H_new: jax.Array


def calc_optimal_dt(beta: float, J: float, mass: float, Nt: int) -> float:
    """Harmonic-oscillator step-size heuristic: dt = 2π√(mJ/β)/(2Nt)
    (src/Simulation.jl:11-14).  Host-side, python floats."""
    period = 2.0 * math.pi * math.sqrt(mass * J / beta)
    return period / (2 * Nt)


def refresh_momentum(key, shape, mass, real_dtype):
    """Complex Gaussian momenta with Re/Im variance m (src/HMC.jl:51-61)."""
    n = jax.random.normal(key, (2,) + shape, dtype=real_dtype)
    scale = jnp.sqrt(mass).astype(real_dtype)
    pi = (n[0] + 1j * n[1]) * scale
    return pi.astype(complex_dtype_of(real_dtype))


def init_chain_state(lat: LatticeSpec, params: ModelParams, key,
                     delta0=None, disorder=None, *, dtype=jnp.float32,
                     n_imp: float | None = None) -> HMCState:
    """Build a self-consistent HMCState: disorder, Δ, and matching eigenpairs.

    ``n_imp`` must be a concrete float (static impurity count); defaults to
    the value stored in ``params`` if that is concrete.
    """
    from ..models.params import init_delta, sample_disorder

    cdtype = complex_dtype_of(dtype)
    k_dis, k_delta, k_chain = jax.random.split(key, 3)
    if disorder is None:
        frac = float(params.n_imp) if n_imp is None else float(n_imp)
        disorder = sample_disorder(k_dis, lat, params.W, frac, dtype=dtype)
    disorder = disorder.astype(dtype)
    if delta0 is None:
        delta0 = init_delta(k_delta, lat, dtype=dtype)
    delta0 = delta0.astype(cdtype)

    H_static = static_hamiltonian(lat, params.t, params.tp, params.mu, disorder)
    H = assemble_bdg(lat, H_static, delta0)
    evals, evecs = diagonalize(H)
    pi = jnp.zeros_like(delta0)
    return HMCState(delta=delta0, pi=pi, disorder=disorder,
                    evals=evals, evecs=evecs, key=k_chain)


def leapfrog(lat: LatticeSpec, H_static, params: ModelParams,
             delta, pi, evals, evecs, Nt: int, dt):
    """Leapfrog integration of the complex-field EOM (src/HMC.jl:88-118).

    dΔ/dt = π/(2m),  dπ/dt = F = −∂H/∂Δ*.  Kicks: half, (Nt−1) full, half.
    Returns the evolved (Δ, π, E, U).
    """
    beta, J, mass = params.beta, params.J, params.mass
    dt = jnp.asarray(dt, dtype=evals.dtype)
    coef_field = dt / (2.0 * mass)

    # Initial half-kick (src/HMC.jl:91-92)
    F0, _ = hmc_forces(lat, delta, evals, evecs, beta, J)
    pi_h = pi + (0.5 * dt) * F0

    def leap_step(carry, _):
        delta, pi, _evals, _evecs, _F = carry
        delta = delta + coef_field * pi
        H = assemble_bdg(lat, H_static, delta)
        evals, evecs = diagonalize(H)
        F, _ = hmc_forces(lat, delta, evals, evecs, beta, J)
        pi = pi + dt * F       # full kick every step; halved after the scan
        return (delta, pi, evals, evecs, F), None

    carry0 = (delta, pi_h, evals, evecs, F0)
    (delta_n, pi_n, evals_n, evecs_n, F_last), _ = lax.scan(
        leap_step, carry0, None, length=Nt)
    # Undo half of the final kick → half + (Nt−1) full + half (src/HMC.jl:98-118)
    pi_n = pi_n - (0.5 * dt) * F_last
    return delta_n, pi_n, evals_n, evecs_n


def hmc_sweep(lat: LatticeSpec, params: ModelParams, state: HMCState,
              Nt: int, dt) -> tuple[HMCState, SweepInfo]:
    """One full HMC trajectory + Metropolis step.  ``Nt`` is static."""
    beta, J, mass = params.beta, params.J, params.mass
    real_dtype = state.evals.dtype

    key, k_mom, k_acc = jax.random.split(state.key, 3)
    pi0 = refresh_momentum(k_mom, state.delta.shape, mass, real_dtype)

    H_old = total_energy(state.delta, pi0, state.evals, beta, J, mass)

    # Static Hamiltonian is O((2N)²) — rebuild per sweep, reuse per step.
    H_static = static_hamiltonian(lat, params.t, params.tp, params.mu,
                                  state.disorder)

    delta_n, pi_n, evals_n, evecs_n = leapfrog(
        lat, H_static, params, state.delta, pi0, state.evals, state.evecs,
        Nt, dt)

    # ΔH as term-by-term differences — conditioning, see energy_difference.
    dH = energy_difference(delta_n, pi_n, evals_n,
                           state.delta, pi0, state.evals, beta, J, mass)
    H_new = H_old + dH

    u = jax.random.uniform(k_acc, (), dtype=jnp.float32)
    accept = (dH < 0) | (u < jnp.exp(-dH.astype(jnp.float32)))

    def sel(new, old):
        return jnp.where(accept, new, old)

    new_state = HMCState(
        delta=sel(delta_n, state.delta),
        pi=pi_n,                               # refreshed next sweep anyway
        disorder=state.disorder,
        evals=sel(evals_n, state.evals),
        evecs=sel(evecs_n, state.evecs),
        key=key,
    )
    return new_state, SweepInfo(accepted=accept, dH=dH, H_old=H_old, H_new=H_new)
