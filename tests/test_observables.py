"""Observable tests: numpy-loop oracles + the clean-limit BCS benchmark
(the reference's headline correctness criterion,
scripts/benchmark_clean.jl:112-123: |⟨Δ_global⟩ − RHS| < 0.02).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwavehmc_tpu import (
    LatticeSpec,
    calc_optimal_dt,
    hmc_sweep,
    init_chain_state,
    make_params,
    neighbor_tables,
    uniform_dwave_delta,
)
from dwavehmc_tpu.models.bcs import bcs_gap_rhs, bcs_selfconsistent_gap
from dwavehmc_tpu.models.observables import measure_observables


def test_observables_match_loop_oracle():
    lat = LatticeSpec(4, 4)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.25,
                         beta=4.0, J=0.8, mass=1.0, dtype=jnp.float64)
    state = init_chain_state(lat, params, jax.random.PRNGKey(0),
                             dtype=jnp.float64, n_imp=0.25)
    obs = measure_observables(lat, params, state)

    # --- independent numpy implementation, straight from the formulas ---
    N = lat.n_sites
    beta, J = 4.0, 0.8
    delta = np.asarray(state.delta)
    U = np.asarray(state.evecs)
    E = np.asarray(state.evals)
    dx, dy = delta[:, 0], delta[:, 1]

    amp = np.mean(0.5 * (np.abs(dx) + np.abs(dy)))
    local = np.mean(0.5 * np.abs(dx - dy))
    gmean = np.mean(0.5 * (dx - dy))

    f = 1.0 / (1.0 + np.exp(beta * E))
    nn, _ = neighbor_tables(lat)
    P = np.zeros((N, 2), dtype=np.complex128)
    for i in range(N):
        for d in range(2):
            j = nn[i, d]
            P[i, d] = -(np.sum(U[i] * f * np.conj(U[j + N]))
                        + np.sum(U[j] * f * np.conj(U[i + N])))
    diff = np.mean(0.5 * (np.abs(dx - J * P[:, 0]) + np.abs(dy - J * P[:, 1])))
    terms = J * 0.5 * (P[:, 0] - P[:, 1])

    hole = 0.0
    for n in range(2 * N):
        if E[n] > 0:
            w = np.sum(np.abs(U[:N, n]) ** 2) - np.sum(np.abs(U[N:, n]) ** 2)
            hole += w * np.tanh(0.5 * beta * E[n])
    hole /= N

    ef = -np.sum((beta * E + 2 * np.log1p(np.exp(-beta * E)))[E > 0])
    eb = beta / (2 * J) * np.sum(np.abs(delta) ** 2)

    np.testing.assert_allclose(float(obs.delta_amp), amp, rtol=1e-12)
    np.testing.assert_allclose(float(obs.delta_local), local, rtol=1e-12)
    np.testing.assert_allclose(float(obs.delta_global), np.abs(gmean), rtol=1e-12)
    np.testing.assert_allclose(float(obs.S_delta), np.abs(gmean) ** 2, rtol=1e-12)
    np.testing.assert_allclose(float(obs.hole_conc), hole, rtol=1e-10)
    np.testing.assert_allclose(float(obs.total_energy), (ef + eb) / N, rtol=1e-10)
    np.testing.assert_allclose(float(obs.delta_diff), diff, rtol=1e-10)
    np.testing.assert_allclose(float(obs.delta_pair), np.abs(np.mean(terms)), rtol=1e-10)
    np.testing.assert_allclose(float(obs.delta_localpair), np.mean(np.abs(terms)), rtol=1e-10)


def test_bcs_rhs_fixed_point_matches_real_space_mean_field():
    """The k-space gap equation and the real-space Δ ← J·P iteration must
    agree in the clean limit (two independent routes to the same MF gap)."""
    lat = LatticeSpec(8, 8)
    t, tp, mu, beta, J = 1.0, -0.35, -1.08, 100.0, 1.6
    gap_k = bcs_selfconsistent_gap(lat, t, tp, mu, beta, J)

    from dwavehmc_tpu import assemble_bdg, diagonalize, static_hamiltonian
    from dwavehmc_tpu.ops.forces import pairing_correlations
    Hs = static_hamiltonian(lat, t, tp, mu, jnp.zeros(lat.n_sites))
    d = uniform_dwave_delta(lat, 0.15, dtype=jnp.float64)

    @jax.jit
    def it(d):
        e, u = diagonalize(assemble_bdg(lat, Hs, d))
        return J * pairing_correlations(lat, e, u, beta)

    for _ in range(800):
        nd = it(d)
        if float(jnp.max(jnp.abs(nd - d))) < 1e-13:
            d = nd
            break
        d = nd
    # real-space gap amplitude: Δ_global = |⟨(Δx−Δy)/2⟩|
    gap_r = float(jnp.abs(jnp.mean(0.5 * (d[:, 0] - d[:, 1]))))
    np.testing.assert_allclose(gap_r, gap_k, atol=1e-8)


def test_hole_concentration_analytic_clean_limit():
    """For Δ=0 the hole-concentration observable reduces to
    (1/N)Σ_k tanh(βε_k/2) = 1 − 2·(filling per spin) — exact plane-wave
    oracle for src/Observables.jl:127-145."""
    from dwavehmc_tpu import init_chain_state
    from dwavehmc_tpu.models.lattice import dispersion, k_grid

    lat = LatticeSpec(8, 8)
    t, tp, mu, beta = 1.0, -0.35, -1.08, 7.0
    params = make_params(t=t, tp=tp, mu=mu, beta=beta, J=1.0,
                         dtype=jnp.float64)
    state = init_chain_state(
        lat, params, jax.random.PRNGKey(0),
        delta0=jnp.zeros((lat.n_sites, 2), dtype=jnp.complex128),
        disorder=jnp.zeros(lat.n_sites), dtype=jnp.float64, n_imp=0.0)
    obs = measure_observables(lat, params, state)

    kx, ky = k_grid(lat)
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    eps = dispersion(KX, KY, t, tp, mu)
    expected = np.mean(np.tanh(0.5 * beta * eps))
    np.testing.assert_allclose(float(obs.hole_conc), expected, atol=1e-10)


@pytest.mark.slow
def test_clean_limit_hmc_matches_bcs_gap_equation():
    """Full HMC chain on a clean 8×8 lattice at β=100, J=1.6 must satisfy
    the BCS gap equation to < 0.02 (scripts/benchmark_clean.jl:119-123)."""
    lat = LatticeSpec(8, 8)
    t, tp, mu, beta, J = 1.0, -0.35, -1.08, 100.0, 1.6
    params = make_params(t=t, tp=tp, mu=mu, W=0.0, n_imp=0.0,
                         beta=beta, J=J, mass=1.0, dtype=jnp.float64)
    state = init_chain_state(
        lat, params, jax.random.PRNGKey(12),
        delta0=uniform_dwave_delta(lat, 0.2, dtype=jnp.float64),
        dtype=jnp.float64, n_imp=0.0)

    sweep = jax.jit(hmc_sweep, static_argnums=(0, 3))
    Nt_th, Nt_me = 20, 6
    dt_th = calc_optimal_dt(beta, J, 1.0, Nt_th)
    dt_me = calc_optimal_dt(beta, J, 1.0, Nt_me)

    for _ in range(40):
        state, _ = sweep(lat, params, state, Nt_th, dt_th)

    acc = 0
    vals = []
    n_meas = 80
    for _ in range(n_meas):
        state, info = sweep(lat, params, state, Nt_me, dt_me)
        acc += int(info.accepted)
        obs = measure_observables(lat, params, state)
        vals.append(float(obs.delta_global))

    gap_hmc = float(np.mean(vals))
    rhs = bcs_gap_rhs(gap_hmc, lat, t, tp, mu, beta, J)
    assert abs(gap_hmc - rhs) < 0.02, (gap_hmc, rhs)
    assert acc / n_meas > 0.5, acc / n_meas
