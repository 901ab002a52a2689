"""HMC sweep tests: symplectic-integrator scaling, reversibility,
determinism, accept/reject state consistency.

Tier-3 equivalents of scripts/test_hmc.jl and the ΔH = O(dt²) property of
the leapfrog (doc/algorithm.md:53-60).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import (
    LatticeSpec,
    assemble_bdg,
    calc_optimal_dt,
    diagonalize,
    hmc_sweep,
    init_chain_state,
    make_params,
    static_hamiltonian,
    total_energy,
)
from dwavehmc_tpu.sampler.hmc import leapfrog, refresh_momentum

LAT = LatticeSpec(4, 4)


def make_setup(beta=5.0, J=1.0, seed=0):
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.25,
                         beta=beta, J=J, mass=1.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(seed)
    state = init_chain_state(LAT, params, key, dtype=jnp.float64, n_imp=0.25)
    return params, state


def trajectory_dH(params, state, Nt, dt):
    """Energy error of one deterministic leapfrog trajectory."""
    key = jax.random.PRNGKey(99)
    pi0 = refresh_momentum(key, state.delta.shape, params.mass, jnp.float64)
    H_static = static_hamiltonian(LAT, params.t, params.tp, params.mu,
                                  state.disorder)
    H_old = total_energy(state.delta, pi0, state.evals,
                         params.beta, params.J, params.mass)
    d, p, e, u = leapfrog(LAT, H_static, params, state.delta, pi0,
                          state.evals, state.evecs, Nt, dt)
    H_new = total_energy(d, p, e, params.beta, params.J, params.mass)
    return float(H_new - H_old)


def test_dH_scales_as_dt_squared():
    """Fixed trajectory length, halve dt ⇒ ΔH shrinks ×4 (leapfrog order)."""
    params, state = make_setup()
    L = 0.4  # trajectory length
    dHs = []
    for Nt in (8, 16, 32):
        dHs.append(abs(trajectory_dH(params, state, Nt, L / Nt)))
    r1 = dHs[0] / dHs[1]
    r2 = dHs[1] / dHs[2]
    assert 3.0 < r1 < 5.0, dHs
    assert 3.0 < r2 < 5.0, dHs


def test_leapfrog_reversibility():
    """Integrate forward, flip momentum, integrate back ⇒ initial state."""
    params, state = make_setup(seed=3)
    Nt, dt = 10, 0.05
    key = jax.random.PRNGKey(5)
    pi0 = refresh_momentum(key, state.delta.shape, params.mass, jnp.float64)
    H_static = static_hamiltonian(LAT, params.t, params.tp, params.mu,
                                  state.disorder)
    d1, p1, e1, u1 = leapfrog(LAT, H_static, params, state.delta, pi0,
                              state.evals, state.evecs, Nt, dt)
    d2, p2, _, _ = leapfrog(LAT, H_static, params, d1, -p1, e1, u1, Nt, dt)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(state.delta), atol=1e-9)
    np.testing.assert_allclose(np.asarray(-p2), np.asarray(pi0), atol=1e-9)


def test_sweep_deterministic_per_key():
    params, state = make_setup(seed=7)
    s1, info1 = jax.jit(hmc_sweep, static_argnums=(0, 3))(LAT, params, state, 5, 0.05)
    s2, info2 = jax.jit(hmc_sweep, static_argnums=(0, 3))(LAT, params, state, 5, 0.05)
    np.testing.assert_array_equal(np.asarray(s1.delta), np.asarray(s2.delta))
    assert float(info1.dH) == float(info2.dH)


def test_sweep_state_consistency():
    """After any sweep, (evals, evecs) must diagonalize H(Δ) of the kept Δ —
    the jnp.where replacement for the reference's reject-restore
    (src/HMC.jl:131-139)."""
    params, state = make_setup(seed=11, beta=30.0)
    sweep = jax.jit(hmc_sweep, static_argnums=(0, 3))
    n_acc = 0
    for i in range(12):
        dt = 0.02 if i % 3 else 1.5  # occasionally force a likely rejection
        state, info = sweep(LAT, params, state, 6, dt)
        n_acc += int(info.accepted)
        H_static = static_hamiltonian(LAT, params.t, params.tp, params.mu,
                                      state.disorder)
        H = assemble_bdg(LAT, H_static, state.delta)
        evals, _ = diagonalize(H)
        np.testing.assert_allclose(np.asarray(evals), np.asarray(state.evals),
                                   atol=1e-9)
    assert 0 < n_acc  # sanity: some sweeps accepted


def test_acceptance_reasonable_with_heuristic_dt():
    """With the reference's dt heuristic (src/Simulation.jl:11-14) the
    acceptance rate should sit well inside the (0.6, 1.0] window."""
    params, state = make_setup(beta=8.0, J=1.0, seed=13)
    Nt = 10
    dt = calc_optimal_dt(8.0, 1.0, 1.0, Nt)
    sweep = jax.jit(hmc_sweep, static_argnums=(0, 3))
    acc = 0
    n = 25
    for _ in range(n):
        state, info = sweep(LAT, params, state, Nt, dt)
        assert np.isfinite(float(info.dH))
        acc += int(info.accepted)
    assert acc / n >= 0.6, acc / n
