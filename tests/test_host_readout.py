"""Host-f64 Metropolis readout (ops/host_energy + run_segment_hostacc).

The device ΔH carries f32 eigenvalue noise that collapses acceptance at
β ≳ 3e3 (measured on hardware: acc 0.20–0.39 at β = 1e4/1e5 with exact
anchors and a floored dt — examples/beta_extreme_validation.json).  The
host readout evaluates H in f64 once per sweep, making the accept decision
exact at any β in the reference grids (scripts/batch_scan_beta.jl:22-25
tops at β = 1e5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dwavehmc_tpu.models.bdg_real import (
    assemble_embedding,
    diagonalize_embedding,
    static_embedding,
)
from dwavehmc_tpu.models.lattice import LatticeSpec
from dwavehmc_tpu.models.params import make_params
from dwavehmc_tpu.ops.host_energy import (
    complex_bdg_np,
    fermion_energy_np,
    kinetic_energy_np,
    potential_batch_np,
    potential_energy_np,
)
from dwavehmc_tpu.parallel.ensemble import (
    _hostacc_fingerprint,
    init_ensemble_real,
    run_segment_hostacc,
    run_segment_tracked,
)
from dwavehmc_tpu.sampler.hmc import calc_optimal_dt
from dwavehmc_tpu.sampler.hmc_real import _energy_terms

LAT = LatticeSpec(4, 4)


def _rand_state(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    N = LAT.n_sites
    dis = jax.random.bernoulli(k1, 0.3, (N,)).astype(dtype) * 1.0
    dre = (0.05 * jax.random.normal(k2, (N, 2))).astype(dtype)
    dim_ = (0.05 * jax.random.normal(k3, (N, 2))).astype(dtype)
    return dis, dre, dim_


def test_host_matrix_matches_device_spectrum():
    """complex128 host BdG spectrum == f32 embedding spectrum (device path)."""
    dis, dre, dim_ = _rand_state(jax.random.PRNGKey(0))
    H = complex_bdg_np(LAT, 1.0, -0.35, -1.08, np.asarray(dis),
                       np.asarray(dre), np.asarray(dim_))
    assert np.allclose(H, H.conj().T)
    w_host = np.linalg.eigvalsh(H)

    M = assemble_embedding(
        LAT, static_embedding(LAT, 1.0, -0.35, -1.08, dis), dre, dim_)
    evals, _, _ = diagonalize_embedding(M.astype(jnp.float32))
    assert np.allclose(np.sort(np.asarray(evals)), np.sort(w_host),
                       atol=5e-5)


def test_host_energy_matches_device_terms():
    """Host f64 potential+kinetic == device _energy_terms to f32 accuracy."""
    dis, dre, dim_ = _rand_state(jax.random.PRNGKey(1))
    beta, J, mass = 7.5, 0.8, 1.0
    pi_re = 0.3 * dre + 0.1
    pi_im = -0.2 * dim_ + 0.05

    M = assemble_embedding(
        LAT, static_embedding(LAT, 1.0, -0.35, -1.08, dis), dre, dim_)
    evals, _, _ = diagonalize_embedding(M.astype(jnp.float32))
    dev = float(_energy_terms(dre, dim_, pi_re, pi_im, evals, beta, J, mass))

    pot = potential_energy_np(LAT, 1.0, -0.35, -1.08, beta, J,
                              np.asarray(dis), np.asarray(dre),
                              np.asarray(dim_))
    kin = kinetic_energy_np(np.asarray(pi_re)[None], np.asarray(pi_im)[None],
                            mass)[0]
    assert abs((pot + kin) - dev) < 2e-3 * max(1.0, abs(dev))


def test_fermion_energy_ph_even_form():
    """PH-even all-levels/2 form equals the reference Σ_{E>0} form."""
    evals = np.array([-2.0, -0.5, 0.5, 2.0])
    beta = 3.0
    ref = -sum(beta * e + 2 * np.log1p(np.exp(-beta * e))
               for e in (0.5, 2.0))
    assert abs(fermion_energy_np(evals, beta) - ref) < 1e-12
    # permutation/sign-noise invariant
    assert abs(fermion_energy_np(evals[::-1] * np.array([1, -1, -1, 1]),
                                 beta) - ref) < 1e-12


def _mini_ensemble(beta, n_chains=2, seed=0, n_imp=0.0):
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=n_imp,
                         beta=beta, J=0.8, mass=1.0, dtype=jnp.float32)
    states = init_ensemble_real(LAT, params, jax.random.PRNGKey(seed),
                                n_chains, dtype=jnp.float32, n_imp=n_imp)
    return params, states


def test_hostacc_matches_device_at_moderate_beta():
    """Same keys ⇒ same proposals; host-f64 dH must agree with the device
    dH to f32 noise, and the accept decisions must coincide."""
    beta = 10.0
    params, states = _mini_ensemble(beta)
    dt = calc_optimal_dt(beta, 0.8, 1.0, 6)

    s_dev, res_dev = run_segment_tracked(
        LAT, params, jax.tree.map(lambda x: x, states), 4, 6, dt,
        measure=False, anchor_every=1)
    s_host, res_host, cache = run_segment_hostacc(
        LAT, params, states, 4, 6, dt, measure=False)

    dH_dev = np.asarray(res_dev.dH)
    dH_host = np.asarray(res_host.dH)
    assert np.all(np.isfinite(dH_host))
    assert np.max(np.abs(dH_dev - dH_host)) < 5e-2
    # decision streams share the same uniforms: flips need |ΔdH|-sized luck
    assert (np.asarray(res_dev.accepted) ==
            np.asarray(res_host.accepted)).mean() >= 0.75
    # accepted Δ match wherever decisions matched throughout
    if bool(np.all(np.asarray(res_dev.accepted)
                   == np.asarray(res_host.accepted))):
        np.testing.assert_array_equal(np.asarray(s_dev.delta_re),
                                      np.asarray(s_host.delta_re))


def test_hostacc_cache_consistency_and_fingerprint():
    """dH must equal the directly recomputed f64 H(new) − H(old); a cache
    from a different chain set must be ignored (fingerprint mismatch)."""
    beta = 50.0
    params, states = _mini_ensemble(beta)
    dt = calc_optimal_dt(beta, 0.8, 1.0, 6)

    # poisoned cache with a WRONG fingerprint: must be recomputed, so the
    # run matches a cache-free run exactly
    bad = {"fp": "not-a-real-fingerprint", "pot": np.full(2, 1e9)}
    _, res_a, _ = run_segment_hostacc(LAT, params,
                                      jax.tree.map(lambda x: x, states),
                                      2, 6, dt, measure=False, pot_cache=bad)
    s_b, res_b, cache = run_segment_hostacc(LAT, params, states, 2, 6, dt,
                                            measure=False)
    np.testing.assert_array_equal(np.asarray(res_a.dH), np.asarray(res_b.dH))
    # the returned fingerprint covers the FINAL state (so the same dict
    # hits on the next back-to-back segment of these chains)
    assert cache["fp"] == _hostacc_fingerprint(
        params, np.asarray(s_b.disorder), np.asarray(s_b.delta_re),
        np.asarray(s_b.delta_im), None)

    # a poisoned cache whose fingerprint matches the handed-in state is
    # trusted (shifts dH) — cross-segment caching still works
    fp0 = _hostacc_fingerprint(params, np.asarray(states.disorder),
                               np.asarray(states.delta_re),
                               np.asarray(states.delta_im), None)
    pot0 = potential_batch_np(LAT, params, np.asarray(states.disorder),
                              np.asarray(states.delta_re),
                              np.asarray(states.delta_im))
    bad2 = {"fp": fp0, "pot": pot0 + 1.0}
    _, res_c, _ = run_segment_hostacc(LAT, params, states, 1, 6, dt,
                                      measure=False, pot_cache=bad2)
    assert not np.allclose(np.asarray(res_c.dH)[0], np.asarray(res_b.dH)[0])


def test_hostacc_cache_not_shared_across_clean_subsets():
    """Regression (ADVICE r3, high): on a CLEAN lattice every equal-sized
    chain subset has the identical all-zeros disorder vector, and the
    bucketed thermalization hands different subsets — at different β —
    through the same cache dict.  Subset B handed subset A's cache must
    recompute, not trust A's potentials."""
    params_a, states_a = _mini_ensemble(50.0, n_chains=2, seed=0)
    params_b, states_b = _mini_ensemble(2000.0, n_chains=2, seed=1)
    assert np.all(np.asarray(states_a.disorder) == 0.0)
    assert np.all(np.asarray(states_b.disorder) == 0.0)
    dt_a = calc_optimal_dt(50.0, 0.8, 1.0, 6)
    dt_b = calc_optimal_dt(2000.0, 0.8, 1.0, 6)

    _, _, cache_a = run_segment_hostacc(LAT, params_a, states_a, 2, 6, dt_a,
                                        measure=False)
    # B with A's cache == B cache-free, byte for byte
    _, res_poison, _ = run_segment_hostacc(
        LAT, params_b, jax.tree.map(lambda x: x, states_b), 2, 6, dt_b,
        measure=False, pot_cache=dict(cache_a))
    _, res_fresh, _ = run_segment_hostacc(LAT, params_b, states_b, 2, 6,
                                          dt_b, measure=False)
    np.testing.assert_array_equal(np.asarray(res_poison.dH),
                                  np.asarray(res_fresh.dH))
    # and same-params same-states different Δ must also miss
    fp1 = _hostacc_fingerprint(params_a, np.asarray(states_a.disorder),
                               np.asarray(states_a.delta_re),
                               np.asarray(states_a.delta_im), None)
    fp2 = _hostacc_fingerprint(params_a, np.asarray(states_a.disorder),
                               np.asarray(states_a.delta_re) + 1e-3,
                               np.asarray(states_a.delta_im), None)
    assert fp1 != fp2


@pytest.mark.parametrize("beta", [1e4, 1e5])
def test_hostacc_extreme_beta_acceptance(beta):
    """At β = 1e4/1e5 (reference β-grid top) the host readout keeps
    acceptance in the window — the whole point of the feature."""
    params, states = _mini_ensemble(beta, n_chains=2, seed=3)
    Nt = 20
    dt = calc_optimal_dt(beta, 0.8, 1.0, Nt)

    # short thermalization, then measure acceptance
    states, _, cache = run_segment_hostacc(LAT, params, states, 10, Nt, dt,
                                           measure=False)
    states, res, _ = run_segment_hostacc(LAT, params, states, 15, Nt, dt,
                                         measure=False, pot_cache=cache)
    acc = float(np.asarray(res.accepted).mean())
    assert np.all(np.isfinite(np.asarray(res.dH)))
    assert acc >= 0.55, f"host-readout acceptance collapsed: {acc}"


def test_potential_batch_per_chain_params():
    """params_axis=0 (per-chain β grid) picks the right β per chain."""
    dis, dre, dim_ = _rand_state(jax.random.PRNGKey(5))
    betas = np.array([2.0, 40.0])
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.0,
                         beta=jnp.asarray(betas, jnp.float32), J=0.8,
                         mass=1.0, dtype=jnp.float32)
    dis_b = np.stack([np.asarray(dis)] * 2)
    dre_b = np.stack([np.asarray(dre)] * 2)
    dim_b = np.stack([np.asarray(dim_)] * 2)
    out = potential_batch_np(LAT, params, dis_b, dre_b, dim_b, params_axis=0)
    exp = [potential_energy_np(LAT, 1.0, -0.35, -1.08, b, 0.8,
                               dis_b[0], dre_b[0], dim_b[0]) for b in betas]
    # make_params stores scalars in f32 (tp = −0.35 rounds); the batch path
    # reads those back, the expectation uses exact python floats
    np.testing.assert_allclose(out, exp, rtol=1e-6)


def test_scan_vectorized_host_readout(tmp_path):
    """End-to-end: vectorized β-scan with metropolis_readout='host' writes
    the standard artifacts and keeps extreme-β acceptance healthy (the
    bucketed thermalization hands chain SUBSETS to the segment runner —
    exercises the cache fingerprint path)."""
    from dwavehmc_tpu.drivers.scan import run_scan_vectorized
    from dwavehmc_tpu.utils.config import RunConfig

    cfg = RunConfig(Lx=4, Ly=4, W=1.0, n_imp=0.0, J=0.8,
                    n_therm=6, n_measure=6, Nt_therm_init=10, Nt_measure=6,
                    measure_transport_freq=3, bin_size=2,
                    dtype="float32", path="real", eigh_mode="tracked",
                    anchor_every=1, metropolis_readout="host",
                    out_dir=str(tmp_path / "scan"), checkpoint_freq=0,
                    verbose=False)
    run_scan_vectorized(cfg, [1e3, 1e5], scan_param="beta", replicas=2)

    for b in ("beta_1000", "beta_100000"):
        obs = np.genfromtxt(str(tmp_path / "scan" / b / "observables.csv"),
                            delimiter=",", names=True)
        assert np.isfinite(obs["dH"]).all()
        assert obs["Accepted"].mean() >= 0.5


def test_serial_driver_host_readout(tmp_path):
    """run_simulation (the C12 rebuild) supports the host readout too —
    deep-cold point stays in the acceptance window."""
    from dwavehmc_tpu.drivers.simulation import run_simulation
    from dwavehmc_tpu.utils.config import RunConfig

    cfg = RunConfig(Lx=4, Ly=4, W=0.5, n_imp=0.25, beta=1e4, J=0.8,
                    eta=0.2, domega=0.2, omega_max=1.0,
                    n_therm=6, n_measure=8, Nt_therm_init=10, Nt_measure=6,
                    measure_transport_freq=4, bin_size=1,
                    n_chains=2, seed=1, dtype="float32", path="real",
                    eigh_mode="tracked", metropolis_readout="host",
                    out_dir=str(tmp_path / "serial_host"), verbose=False,
                    checkpoint_freq=0)
    run_simulation(cfg)
    obs = np.genfromtxt(str(tmp_path / "serial_host" / "observables.csv"),
                        delimiter=",", names=True)
    assert np.isfinite(obs["dH"]).all()
    assert obs["Accepted"].mean() >= 0.5


def test_nonfinite_proposal_rejected():
    """A NaN Δ proposal must produce +inf potential ⇒ reject, not a crash."""
    dis, dre, dim_ = _rand_state(jax.random.PRNGKey(6))
    bad = np.asarray(dre).copy()
    bad[0, 0] = np.nan
    pot = potential_energy_np(LAT, 1.0, -0.35, -1.08, 10.0, 0.8,
                              np.asarray(dis), bad, np.asarray(dim_))
    assert pot == float("inf")
