"""Light observables on the real-pair path — same nine scalars as
models/observables.py (src/Observables.jl:70-222), complex-free."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lattice import LatticeSpec
from .observables import ObservablesResult
from .params import ModelParams
from ..ops.forces_real import pairing_correlations_real


def measure_observables_real(lat: LatticeSpec, params: ModelParams,
                             state) -> ObservablesResult:
    N = lat.n_sites
    beta, J = params.beta, params.J
    dre, dim = state.delta_re, state.delta_im

    abs_dx = jnp.sqrt(dre[:, 0]**2 + dim[:, 0]**2)
    abs_dy = jnp.sqrt(dre[:, 1]**2 + dim[:, 1]**2)
    amp = jnp.mean(0.5 * (abs_dx + abs_dy))
    gre = dre[:, 0] - dre[:, 1]
    gim = dim[:, 0] - dim[:, 1]
    local = jnp.mean(0.5 * jnp.sqrt(gre**2 + gim**2))
    mre = jnp.mean(0.5 * gre)
    mim = jnp.mean(0.5 * gim)
    S = mre**2 + mim**2
    glob = jnp.sqrt(S)

    E, X, Y = state.evals, state.X, state.Y
    # PH-even all-levels/2 forms (see sampler/hmc_real._energy_terms):
    # ``E`` is an unsorted tracked spectrum on cheap-anchor sweeps, where
    # sign noise on the near-zero PH pair would make an E>0 restriction
    # mis-count levels.  Both summands are even under (E, u, v) → (−E, v*,
    # u*): w flips sign with tanh, and g(E) = β|E| + 2·softplus(−β|E|) is
    # even outright — so summing every level once and halving equals the
    # reference's Σ_{E>0} (src/Observables.jl:127-165) exactly under PH
    # pairing, independent of level order or near-zero sign flips.
    w = (jnp.sum(X[:N]**2 + Y[:N]**2, axis=0)
         - jnp.sum(X[N:]**2 + Y[N:]**2, axis=0))
    hole = 0.5 * jnp.sum(w * jnp.tanh(0.5 * beta * E)) / N

    x = beta * jnp.abs(E)
    fer = -0.5 * jnp.sum(x + 2.0 * jax.nn.softplus(-x))
    bos = (beta / (2.0 * J)) * jnp.sum(dre**2 + dim**2)
    energy = (fer + bos) / N

    P_re, P_im = pairing_correlations_real(lat, E, X, Y, beta)
    diff_re = dre - J * P_re
    diff_im = dim - J * P_im
    diff = jnp.mean(0.5 * (jnp.sqrt(diff_re[:, 0]**2 + diff_im[:, 0]**2)
                           + jnp.sqrt(diff_re[:, 1]**2 + diff_im[:, 1]**2)))
    tre = J * 0.5 * (P_re[:, 0] - P_re[:, 1])
    tim = J * 0.5 * (P_im[:, 0] - P_im[:, 1])
    pair = jnp.sqrt(jnp.mean(tre)**2 + jnp.mean(tim)**2)
    localpair = jnp.mean(jnp.sqrt(tre**2 + tim**2))

    return ObservablesResult(
        total_energy=energy, delta_amp=amp, delta_local=local,
        delta_global=glob, S_delta=S, hole_conc=hole,
        delta_diff=diff, delta_pair=pair, delta_localpair=localpair)
