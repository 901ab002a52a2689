"""Force-kernel correctness.

1. Wirtinger gradient check: F = −∂H_pot/∂Δ* where
   H_pot = β/(2J)Σ|Δ|² + E_fermion(eigvals(H_BdG(Δ)))  — verified with
   jax.grad on the real/imag parts (oracle for src/Observables.jl:14-62).
2. Mean-field fixed point: iterating Δ ← J·P drives ‖F‖ → 0
   (rebuild of scripts/test_forces.jl:31-53).
3. Kernel-equivalence: vectorized contraction vs a direct per-bond numpy
   loop (rebuild of scripts/bench_forces.jl:124-129, tolerance 1e-10).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import (
    LatticeSpec,
    assemble_bdg,
    diagonalize,
    hmc_forces,
    neighbor_tables,
    pairing_correlations,
    static_hamiltonian,
)
from dwavehmc_tpu.ops.spectral import boson_energy, fermion_energy


def setup(lat, seed=0, W=0.6, n_imp=0.2):
    rng = np.random.default_rng(seed)
    disorder = np.zeros(lat.n_sites)
    idx = rng.permutation(lat.n_sites)[: int(round(lat.n_sites * n_imp))]
    disorder[idx] = W
    delta = 0.25 * (rng.normal(size=(lat.n_sites, 2))
                    + 1j * rng.normal(size=(lat.n_sites, 2)))
    return jnp.asarray(disorder), jnp.asarray(delta)


def test_force_is_wirtinger_gradient():
    lat = LatticeSpec(4, 4)
    t, tp, mu, beta, J = 1.0, -0.35, -1.08, 4.0, 0.8
    disorder, delta = setup(lat)
    H_static = static_hamiltonian(lat, t, tp, mu, disorder)

    def H_pot(re, im):
        d = re + 1j * im
        evals, _ = diagonalize(assemble_bdg(lat, H_static, d))
        return boson_energy(d, beta, J) + fermion_energy(evals, beta)

    g_re = jax.grad(H_pot, argnums=0)(delta.real, delta.imag)
    g_im = jax.grad(H_pot, argnums=1)(delta.real, delta.imag)
    # F = −∂H/∂Δ* = −½(∂H/∂Re + i ∂H/∂Im)
    F_expected = -0.5 * (g_re + 1j * g_im)

    evals, evecs = diagonalize(assemble_bdg(lat, H_static, delta))
    F, _ = hmc_forces(lat, delta, evals, evecs, beta, J)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_expected),
                               atol=1e-10, rtol=1e-8)


def test_mean_field_fixed_point_kills_force():
    """Δ ← J·P iteration converges and the HMC force vanishes there
    (scripts/test_forces.jl:31-53 criterion)."""
    lat = LatticeSpec(6, 6)
    t, tp, mu, beta, J = 1.0, -0.35, -1.08, 100.0, 1.6
    disorder = jnp.zeros(lat.n_sites)
    H_static = static_hamiltonian(lat, t, tp, mu, disorder)

    from dwavehmc_tpu import uniform_dwave_delta
    delta = uniform_dwave_delta(lat, 0.15, dtype=jnp.float64)

    @jax.jit
    def iterate(d):
        evals, evecs = diagonalize(assemble_bdg(lat, H_static, d))
        P = pairing_correlations(lat, evals, evecs, beta)
        return J * P

    for _ in range(2000):
        new = iterate(delta)
        if float(jnp.max(jnp.abs(new - delta))) < 1e-12:
            delta = new
            break
        delta = new

    evals, evecs = diagonalize(assemble_bdg(lat, H_static, delta))
    F, P = hmc_forces(lat, delta, evals, evecs, beta, J)
    assert float(jnp.max(jnp.abs(F))) < 1e-8
    # fixed point is a genuine d-wave solution, not the trivial Δ=0
    assert float(jnp.mean(jnp.abs(delta))) > 0.05


def test_matches_per_bond_loop_oracle():
    """Vectorized P vs direct Σ_n loop (scripts/bench_forces.jl equivalence,
    1e-10 bar)."""
    lat = LatticeSpec(4, 5)
    beta = 2.3
    disorder, delta = setup(lat, seed=7)
    H_static = static_hamiltonian(lat, 1.0, -0.35, -0.7, disorder)
    evals, evecs = diagonalize(assemble_bdg(lat, H_static, delta))

    P_vec = np.asarray(pairing_correlations(lat, evals, evecs, beta))

    U = np.asarray(evecs)
    E = np.asarray(evals)
    f = 1.0 / (1.0 + np.exp(beta * E))
    nn, _ = neighbor_tables(lat)
    N = lat.n_sites
    P_loop = np.zeros((N, 2), dtype=np.complex128)
    for i in range(N):
        for dirn in range(2):
            j = nn[i, dirn]
            rho1 = np.sum(U[i] * f * np.conj(U[j + N]))
            rho2 = np.sum(U[j] * f * np.conj(U[i + N]))
            P_loop[i, dirn] = -rho1 - rho2
    np.testing.assert_allclose(P_vec, P_loop, atol=1e-10)
