"""Cheap-anchor (anchor_every>1) sampling validation: equilibrium
observables must match the fully exact-anchored tracked mode within
statistical error, and dH between the modes must agree closely when the
endpoint refinement is tight."""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.parallel.ensemble import (
    init_ensemble_real,
    run_segment_tracked,
)

LAT = LatticeSpec(6, 6)


def test_cheap_anchor_dH_close_to_exact_anchor():
    """Same keys: per-sweep dH with cheap anchors ≈ exact-anchor dH."""
    params = make_params(W=0.5, n_imp=0.25, beta=20.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(0), 2,
                                 dtype=jnp.float64, n_imp=0.25)
    Nt = 6
    dt = calc_optimal_dt(20.0, 1.0, 1.0, Nt)
    _, seg_exact = run_segment_tracked(LAT, params, states0, 6, Nt, dt,
                                       False, None, None, 8, 1)
    _, seg_cheap = run_segment_tracked(LAT, params, states0, 6, Nt, dt,
                                       False, None, None, 8, 1000, 16)
    dh_e = np.asarray(seg_exact.dH)
    dh_c = np.asarray(seg_cheap.dH)
    # trajectories identical (same keys, same forces); only the endpoint
    # spectra differ → dH difference is the anchor error
    np.testing.assert_allclose(dh_c, dh_e, atol=0.05, rtol=0.05)


def test_cheap_anchor_equilibrium_matches():
    """Longer run: pairing amplitude with anchor_every=4 within statistical
    error of anchor_every=1."""
    params = make_params(W=0.0, n_imp=0.0, beta=50.0, J=1.6,
                         dtype=jnp.float64)
    Nt = 8
    dt = calc_optimal_dt(50.0, 1.6, 1.0, Nt)

    def run(anchor_every, seed):
        states = init_ensemble_real(LAT, params, jax.random.PRNGKey(seed), 2,
                                    dtype=jnp.float64, n_imp=0.0)
        states, _ = run_segment_tracked(LAT, params, states, 15, Nt, dt,
                                        False, None, None, 8, anchor_every,
                                        16)
        states, seg = run_segment_tracked(LAT, params, states, 25, Nt, dt,
                                          True, None, None, 8, anchor_every,
                                          16)
        amps = np.asarray(seg.observables.delta_pair)
        return amps.mean(), amps.std() / np.sqrt(amps.size / 4), \
            np.asarray(seg.accepted).mean()

    m1, s1, a1 = run(1, 11)
    m4, s4, a4 = run(4, 12)
    tol = 4 * max(s1, s4) + 0.02
    assert abs(m1 - m4) < tol, (m1, m4, tol)
    assert abs(a1 - a4) < 0.3, (a1, a4)


def test_cheap_anchor_bias_f32_midscale():
    """f32 bias bound nearer production shape (12×12, batch 4,
    anchor_every 10): paired cheap-vs-exact dH on identical proposals must
    differ ≪ the O(1) Metropolis scale.  (The 16×16/batch-8 on-TPU version
    runs via scripts/validate_cheap_anchor.py and is recorded in
    examples/cheap_anchor_validation.json.)"""
    from dwavehmc_tpu.parallel.ensemble import (
        _tracked_accept_jit, _tracked_leapfrog_jit,
    )

    lat = LatticeSpec(12, 12)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=10.0, J=0.8, mass=1.0, dtype=jnp.float32)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), 4,
                                dtype=jnp.float32, n_imp=0.05)
    Nt = 6
    dt = calc_optimal_dt(10.0, 0.8, 1.0, Nt)
    states, _ = run_segment_tracked(lat, params, states, 4, 12,
                                    calc_optimal_dt(10.0, 0.8, 1.0, 12),
                                    False, None, None, 6)

    max_err = 0.0
    for _ in range(3):
        prop = _tracked_leapfrog_jit(lat, params, states, Nt, dt, 6,
                                     None, None, 20)
        _, info_cheap, _ = _tracked_accept_jit(lat, params, states, prop,
                                               False, None, True)
        states, info_exact, _ = _tracked_accept_jit(lat, params, states,
                                                    prop, False, None, False)
        err = np.max(np.abs(np.asarray(info_cheap.dH, dtype=np.float64)
                            - np.asarray(info_exact.dH, dtype=np.float64)))
        max_err = max(max_err, float(err))
    # Metropolis scale is O(1); a dH error of 0.05 shifts acceptance by
    # < 5% in the worst case and ~0 on average (sign-symmetric residual)
    assert max_err < 5e-2, max_err


# --- PH-even energy diagnostics on unsorted/sign-noised spectra -------------
#
# Cheap-anchor sweeps carry UNSORTED tracked spectra whose near-zero PH pair
# can read with the wrong sign (both members positive, say).  The logged
# H_old / Energy / Hole_p diagnostics must be invariant to that noise — the
# |E|/2 even forms guarantee it exactly; the old E>0 restriction mis-counted
# a level (spurious ±2·log 2 in the fermion sum).

def test_energy_terms_invariant_to_sign_noise_and_order():
    from dwavehmc_tpu.sampler.hmc_real import _energy_terms

    z = jnp.zeros((4, 2))
    # exact PH-paired spectrum with a near-degenerate zero pair
    e_true = jnp.asarray([-2.0, -1.0, -1e-9, 1e-9, 1.0, 2.0])
    # sign noise: the -1e-9 member reads positive -> both members positive
    e_noisy = jnp.asarray([-2.0, -1.0, 2e-9, 1e-9, 1.0, 2.0])
    perm = jnp.asarray([3, 0, 5, 1, 4, 2])

    h_true = _energy_terms(z, z, z, z, e_true, 10.0, 0.8, 1.0)
    h_noisy = _energy_terms(z, z, z, z, e_noisy[perm], 10.0, 0.8, 1.0)
    np.testing.assert_allclose(float(h_noisy), float(h_true),
                               rtol=0, atol=1e-7)


def test_observables_real_energy_invariant_paired_sweep():
    """Paired measurement: the same physical state measured with (a) the
    exact sorted spectrum and (b) a permuted, sign-noised copy of it must
    log identical Energy; Hole_p must be order-invariant."""
    from dwavehmc_tpu.models.observables_real import measure_observables_real
    from dwavehmc_tpu.sampler.hmc_real import init_chain_state_real

    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=0.8,
                         dtype=jnp.float64)
    st = init_chain_state_real(LAT, params, jax.random.PRNGKey(3),
                               dtype=jnp.float64, n_imp=0.25)
    obs_a = measure_observables_real(LAT, params, st)

    # permute levels and flip three eigenvalue signs (hole keeps the
    # permutation only: w.tanh is not invariant to a bare sign flip)
    n = st.evals.shape[0]
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(4), n))
    st_p = st._replace(evals=st.evals[perm], X=st.X[:, perm],
                       Y=st.Y[:, perm])
    obs_p = measure_observables_real(LAT, params, st_p)
    np.testing.assert_allclose(float(obs_p.total_energy),
                               float(obs_a.total_energy), rtol=1e-12)
    np.testing.assert_allclose(float(obs_p.hole_conc),
                               float(obs_a.hole_conc), rtol=1e-12)

    flip = np.ones(n)
    flip[[0, n // 2, n - 1]] = -1.0
    st_f = st._replace(evals=st.evals * jnp.asarray(flip))
    obs_f = measure_observables_real(LAT, params, st_f)
    np.testing.assert_allclose(float(obs_f.total_energy),
                               float(obs_a.total_energy), rtol=1e-12)
