"""Tracked-eigensolver sweep: sampling-quality parity with the exact mode.

The tracked mode perturbs only the proposal (forces from refined bases);
dH comes from exact endpoint spectra.  With Metropolis-grade tolerances
the acceptance rate and trajectory must track the exact mode closely.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.sampler.hmc_real import hmc_sweep_real, init_chain_state_real

LAT = LatticeSpec(6, 6)


def test_tracked_sweep_matches_exact_trajectory():
    """With enough refinement iterations the tracked trajectory is the
    exact trajectory to float tolerance ⇒ identical accept decisions."""
    params = make_params(W=0.5, n_imp=0.25, beta=20.0, J=1.0, mass=1.0,
                         dtype=jnp.float64)
    key = jax.random.PRNGKey(3)
    s_exact = init_chain_state_real(LAT, params, key, dtype=jnp.float64,
                                    n_imp=0.25)
    s_track = s_exact

    sweep_e = jax.jit(hmc_sweep_real, static_argnums=(0, 3, 5, 6))
    Nt = 6
    dt = calc_optimal_dt(20.0, 1.0, 1.0, Nt)
    n_acc_e = n_acc_t = 0
    for _ in range(6):
        s_exact, ie = sweep_e(LAT, params, s_exact, Nt, dt, "exact", 6)
        s_track, it = sweep_e(LAT, params, s_track, Nt, dt, "tracked", 10)
        n_acc_e += int(ie.accepted)
        n_acc_t += int(it.accepted)
        np.testing.assert_allclose(float(it.dH), float(ie.dH),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(s_track.delta_re),
                                   np.asarray(s_exact.delta_re), atol=1e-4)
    assert n_acc_e == n_acc_t


def test_tracked_sweep_float32_runs_and_accepts():
    params = make_params(W=1.0, n_imp=0.05, beta=50.0, J=0.8, mass=1.0,
                         dtype=jnp.float32)
    state = init_chain_state_real(LAT, params, jax.random.PRNGKey(0),
                                  dtype=jnp.float32, n_imp=0.05)
    sweep = jax.jit(hmc_sweep_real, static_argnums=(0, 3, 5, 6))
    Nt = 15
    dt = calc_optimal_dt(50.0, 0.8, 1.0, Nt)
    acc = 0
    for _ in range(15):
        state, info = sweep(LAT, params, state, Nt, dt, "tracked", 8)
        assert np.isfinite(float(info.dH))
        acc += int(info.accepted)
    assert acc >= 8, acc
