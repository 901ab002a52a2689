"""Per-sweep light observables, fully vectorized.

Rebuild of measure_observables (src/Observables.jl:70-222): the nine
scalars written to observables.csv every sweep.  All per-site and
per-eigenstate loops become masked reductions; the pairing expectation P
reuses the force kernel's contraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.lattice import LatticeSpec
from ..models.params import HMCState, ModelParams
from ..ops.forces import pairing_correlations
from ..ops.spectral import boson_energy, fermion_energy


class ObservablesResult(NamedTuple):
    """Field-for-field match of the reference struct (src/Observables.jl:70-80)."""

    total_energy: jax.Array   # (E_fermion + E_boson)/N
    delta_amp: jax.Array      # ⟨(|Δx|+|Δy|)/2⟩
    delta_local: jax.Array    # ⟨|Δx−Δy|/2⟩
    delta_global: jax.Array   # |⟨(Δx−Δy)/2⟩|
    S_delta: jax.Array        # |⟨(Δx−Δy)/2⟩|²  (structure factor)
    hole_conc: jax.Array      # (1/N)Σ_{E>0}[Σ_i(|u|²−|v|²)]·tanh(βE/2)
    delta_diff: jax.Array     # ⟨|Δ − J·P|⟩  (self-consistency residual)
    delta_pair: jax.Array     # |⟨J(Px−Py)/2⟩|
    delta_localpair: jax.Array  # ⟨|J(Px−Py)/2|⟩


def measure_observables(lat: LatticeSpec, params: ModelParams,
                        state: HMCState) -> ObservablesResult:
    N = lat.n_sites
    beta, J = params.beta, params.J
    dx, dy = state.delta[:, 0], state.delta[:, 1]

    # --- order parameters (src/Observables.jl:97-117) ---
    amp = jnp.mean(0.5 * (jnp.abs(dx) + jnp.abs(dy)))
    local = jnp.mean(0.5 * jnp.abs(dx - dy))
    global_mean = jnp.mean(0.5 * (dx - dy))
    glob = jnp.abs(global_mean)
    S = jnp.abs(global_mean) ** 2

    # --- hole concentration (src/Observables.jl:127-145) ---
    U = state.evecs
    E = state.evals
    w = jnp.sum(jnp.abs(U[:N]) ** 2, axis=0) - jnp.sum(jnp.abs(U[N:]) ** 2, axis=0)
    hole = jnp.sum(jnp.where(E > 0, w * jnp.tanh(0.5 * beta * E), 0.0)) / N

    # --- per-site energy (src/Observables.jl:151-165) ---
    energy = (fermion_energy(E, beta) + boson_energy(state.delta, beta, J)) / N

    # --- self-consistency & fermionic pairing (src/Observables.jl:170-219) ---
    P = pairing_correlations(lat, E, U, beta)
    diff = jnp.mean(0.5 * (jnp.abs(state.delta[:, 0] - J * P[:, 0])
                           + jnp.abs(state.delta[:, 1] - J * P[:, 1])))
    pair_terms = J * 0.5 * (P[:, 0] - P[:, 1])
    pair = jnp.abs(jnp.mean(pair_terms))
    localpair = jnp.mean(jnp.abs(pair_terms))

    return ObservablesResult(
        total_energy=energy, delta_amp=amp, delta_local=local,
        delta_global=glob, S_delta=S, hole_conc=hole,
        delta_diff=diff, delta_pair=pair, delta_localpair=localpair,
    )
