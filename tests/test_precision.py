"""Numerical-conditioning tests for the TPU float32 path.

The Metropolis step needs ΔH to survive float32 at large β; the
difference-based evaluation (ops/spectral.py:energy_difference) must match
the subtractive float64 oracle and beat it decisively in float32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import (
    LatticeSpec,
    calc_optimal_dt,
    hmc_sweep,
    init_chain_state,
    make_params,
    total_energy,
)
from dwavehmc_tpu.ops.spectral import energy_difference


def _random_pair(rng, n_sites, dim, scale=1.0):
    def cplx(shape):
        return rng.normal(size=shape) + 1j * rng.normal(size=shape)
    delta_o = 0.3 * cplx((n_sites, 2))
    pi_o = cplx((n_sites, 2))
    E = np.sort(rng.uniform(0.05, 4.0, size=dim // 2))
    evals_o = np.sort(np.concatenate([E, -E]))
    # a nearby new point: small perturbations
    delta_n = delta_o + scale * 1e-3 * cplx((n_sites, 2))
    pi_n = pi_o + scale * 1e-3 * cplx((n_sites, 2))
    evals_n = np.sort(evals_o + scale * 1e-4 * rng.normal(size=dim))
    return delta_o, pi_o, evals_o, delta_n, pi_n, evals_n


def test_difference_matches_subtractive_in_float64():
    rng = np.random.default_rng(0)
    args = _random_pair(rng, 64, 128)
    do, po, eo, dn, pn, en = [jnp.asarray(a) for a in args]
    beta, J, mass = 37.0, 0.8, 1.0
    dH_diff = float(energy_difference(dn, pn, en, do, po, eo, beta, J, mass))
    dH_sub = float(total_energy(dn, pn, en, beta, J, mass)
                   - total_energy(do, po, eo, beta, J, mass))
    np.testing.assert_allclose(dH_diff, dH_sub, rtol=1e-9, atol=1e-9)


def test_difference_form_beats_subtractive_in_float32():
    """At β = 2e3 on a 2N=1152-level spectrum, the float32 subtractive ΔH
    loses digits; the difference form must stay within 1% of the float64
    truth (and the subtractive error must be ≥ 5× worse)."""
    rng = np.random.default_rng(1)
    args = _random_pair(rng, 576, 1152)
    beta, J, mass = 2e3, 0.8, 1.0

    def to32(x):
        return jnp.asarray(
            np.asarray(x),
            dtype=jnp.complex64 if np.iscomplexobj(np.asarray(x))
            else jnp.float32)

    do32, po32, eo32, dn32, pn32, en32 = [to32(a) for a in args]

    # truth: float64 arithmetic on the SAME float32-rounded inputs — this
    # isolates summation conditioning (what the difference form fixes) from
    # input rounding (identical for both forms).
    do, po, eo, dn, pn, en = [
        jnp.asarray(np.asarray(a), dtype=jnp.complex128
                    if np.iscomplexobj(np.asarray(a)) else jnp.float64)
        for a in (np.asarray(do32), np.asarray(po32), np.asarray(eo32),
                  np.asarray(dn32), np.asarray(pn32), np.asarray(en32))]
    truth = float(energy_difference(dn, pn, en, do, po, eo, beta, J, mass))
    dH_diff32 = float(energy_difference(dn32, pn32, en32, do32, po32, eo32,
                                        jnp.float32(beta), jnp.float32(J),
                                        jnp.float32(mass)))
    dH_sub32 = float(
        total_energy(dn32, pn32, en32, jnp.float32(beta), jnp.float32(J),
                     jnp.float32(mass))
        - total_energy(do32, po32, eo32, jnp.float32(beta), jnp.float32(J),
                       jnp.float32(mass)))

    err_diff = abs(dH_diff32 - truth)
    err_sub = abs(dH_sub32 - truth)
    assert err_diff < 0.01 * abs(truth) + 0.05, (dH_diff32, truth)
    assert err_sub > 5 * err_diff, (err_sub, err_diff)


def test_float32_sweep_accepts_at_large_beta():
    """End-to-end float32 sanity at β=500: with the heuristic dt the sweep
    must still produce finite dH of plausible size and accept regularly
    (the TPU precision-parity criterion, BASELINE.md)."""
    lat = LatticeSpec(6, 6)
    beta, J = 500.0, 1.0
    params = make_params(W=0.5, n_imp=0.25, beta=beta, J=J, mass=1.0,
                         dtype=jnp.float32)
    state = init_chain_state(lat, params, jax.random.PRNGKey(0),
                             dtype=jnp.float32, n_imp=0.25)
    sweep = jax.jit(hmc_sweep, static_argnums=(0, 3))
    Nt = 10
    dt = calc_optimal_dt(beta, J, 1.0, Nt)
    acc = 0
    n = 20
    for _ in range(n):
        state, info = sweep(lat, params, state, Nt, dt)
        assert np.isfinite(float(info.dH))
        acc += int(info.accepted)
    assert acc / n >= 0.5, acc / n
