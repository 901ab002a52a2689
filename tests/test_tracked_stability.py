"""Float32 stability stress of the tracked solver at production scale:
dense spectra (2N=512), large leapfrog steps — must never produce NaN
(divergence here used to feed NaN into the exact eigh and hard-crash the
TPU worker), and non-finite proposals must be auto-rejected."""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.parallel.ensemble import (
    _tracked_accept_jit,
    _tracked_leapfrog_jit,
    init_ensemble_real,
    run_segment_real_jit,
    run_segment_tracked,
)


def test_tracked_residual_finite_at_scale_f32():
    lat = LatticeSpec(16, 16)
    beta, J = 10.0, 0.8
    params = make_params(W=1.0, n_imp=0.05, beta=beta, J=J,
                         dtype=jnp.float32)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), 2,
                                dtype=jnp.float32, n_imp=0.05)
    # thermalize with exact mode (known good)
    dt_th = calc_optimal_dt(beta, J, 1.0, 20)
    states, _ = run_segment_real_jit(lat, params, states, 3, 20, dt_th,
                                     False, None)

    dt = calc_optimal_dt(beta, J, 1.0, 6)
    prop = _tracked_leapfrog_jit(lat, params, states, 6, dt, 6, None, None)
    res = np.asarray(prop[-1])
    assert np.all(np.isfinite(res)), res
    # proposal fields finite
    for leaf in prop[:4]:
        assert np.all(np.isfinite(np.asarray(leaf)))

    states2, info, _ = _tracked_accept_jit(lat, params, states, prop,
                                           False, None)
    assert np.all(np.isfinite(np.asarray(info.dH)))


def test_nonfinite_proposal_rejected_and_sanitized():
    lat = LatticeSpec(4, 4)
    params = make_params(W=0.0, n_imp=0.0, beta=5.0, J=1.0,
                         dtype=jnp.float64)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), 1,
                                dtype=jnp.float64, n_imp=0.0)
    prop = _tracked_leapfrog_jit(lat, params, states, 3, 0.05, 6, None, None)
    # poison the proposal fields
    prop = list(prop)
    prop[0] = prop[0].at[0, 0, 0].set(jnp.nan)
    prop[1] = prop[1].at[0, 1, 1].set(jnp.inf)
    states2, info, _ = _tracked_accept_jit(lat, params, states, tuple(prop),
                                           False, None)
    assert not bool(info.accepted[0])
    # kept state untouched and finite
    np.testing.assert_array_equal(np.asarray(states2.delta_re),
                                  np.asarray(states.delta_re))
    assert np.all(np.isfinite(np.asarray(states2.evals)))


def test_tracked_segment_still_samples_after_caps():
    """With the global rotation cap the tracked segment must still accept
    at a reasonable rate on a small lattice."""
    lat = LatticeSpec(6, 6)
    beta, J = 20.0, 1.0
    params = make_params(W=0.5, n_imp=0.25, beta=beta, J=J,
                         dtype=jnp.float64)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(3), 2,
                                dtype=jnp.float64, n_imp=0.25)
    Nt = 8
    dt = calc_optimal_dt(beta, J, 1.0, Nt)
    states, seg = run_segment_tracked(lat, params, states, 10, Nt, dt,
                                      False, None, None, 8)
    acc = np.asarray(seg.accepted).mean()
    assert acc >= 0.5, acc
