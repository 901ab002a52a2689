"""Statistical parity between the float32 production path and the float64
oracle (BASELINE.md: acceptance rate and observables must match within
statistical tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.models.observables_real import measure_observables_real
from dwavehmc_tpu.sampler.hmc_real import hmc_sweep_real, init_chain_state_real


def run_chain(dtype, n_sweeps=60, beta=30.0, seed=0):
    lat = LatticeSpec(8, 8)
    params = make_params(W=1.0, n_imp=0.05, beta=beta, J=1.0, mass=1.0,
                         dtype=dtype)
    state = init_chain_state_real(lat, params, jax.random.PRNGKey(seed),
                                  dtype=dtype, n_imp=0.05)
    sweep = jax.jit(hmc_sweep_real, static_argnums=(0, 3, 5, 6))
    Nt = 12
    dt = calc_optimal_dt(beta, 1.0, 1.0, Nt)
    acc, amps, energies = 0, [], []
    for _ in range(n_sweeps):
        state, info = sweep(lat, params, state, Nt, dt, "exact", 6)
        acc += int(info.accepted)
        obs = measure_observables_real(lat, params, state)
        amps.append(float(obs.delta_amp))
        energies.append(float(obs.total_energy))
    half = n_sweeps // 2
    return (acc / n_sweeps, np.mean(amps[half:]), np.std(amps[half:]),
            np.mean(energies[half:]))


@pytest.mark.slow
def test_float32_matches_float64_statistics():
    acc32, amp32, std32, e32 = run_chain(jnp.float32)
    acc64, amp64, std64, e64 = run_chain(jnp.float64)
    # acceptance within 15 percentage points (binomial noise over 60 sweeps
    # is ~6pp; float noise shifts trajectories chaotically but the RATE
    # must agree)
    assert abs(acc32 - acc64) < 0.15, (acc32, acc64)
    # equilibrium amplitude within a few sigma of each other
    tol = 4 * max(std32, std64) / np.sqrt(30) + 0.02
    assert abs(amp32 - amp64) < max(tol, 0.05), (amp32, amp64)
    assert abs(e32 - e64) / abs(e64) < 0.05, (e32, e64)
