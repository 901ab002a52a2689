"""Transport/spectra tests against direct numpy-loop oracles implementing
the reference formulas (src/Observables.jl:237-526), plus physics checks:
gauge invariance (ρ_s ≈ 0 in the normal state) and a finite d-wave ρ_s.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import (
    LatticeSpec,
    SpectralSpec,
    assemble_bdg,
    diagonalize,
    init_chain_state,
    make_params,
    neighbor_tables,
    static_hamiltonian,
    uniform_dwave_delta,
)
from dwavehmc_tpu.models.lattice import antinodal_phases
from dwavehmc_tpu.models.transport import (
    current_matrix_elements,
    current_operator_particle,
    measure_transport_and_spectra,
)

LAT = LatticeSpec(4, 4)
SPEC = SpectralSpec(eta=0.15, domega=0.1, omega_max=1.2)


def make_state(seed=0, beta=3.0, W=0.6, n_imp=0.25):
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=W, n_imp=n_imp,
                         beta=beta, J=0.8, mass=1.0, dtype=jnp.float64)
    state = init_chain_state(LAT, params, jax.random.PRNGKey(seed),
                             dtype=jnp.float64, n_imp=n_imp)
    return params, state


def numpy_oracle(lat, spec, t, tp, beta, E, U):
    """Direct per-element implementation of every reference formula."""
    N = lat.n_sites
    dim = 2 * N
    nn, nnn = neighbor_tables(lat)
    eta = spec.eta

    Jp = np.zeros((N, N), dtype=np.complex128)
    for i in range(N):
        for jmap, hop in ((nn[:, 0], t), (nnn[:, 0], tp), (nnn[:, 3], tp)):
            j = jmap[i]
            Jp[i, j] += 1j * hop
            Jp[j, i] += np.conj(1j * hop)
    Jx = np.block([[Jp, np.zeros((N, N))], [np.zeros((N, N)), Jp]])
    J_mn = U.conj().T @ (Jx @ U)
    J2 = np.abs(J_mn) ** 2
    f = 1.0 / (1.0 + np.exp(beta * E))

    # diamagnetic
    dia = 0.0
    for n in range(dim):
        if E[n] > 0:
            w = 0.0
            for i in range(N):
                for jmap, hop in ((nn[:, 0], t), (nnn[:, 0], tp), (nnn[:, 3], tp)):
                    j = jmap[i]
                    w += hop * 2.0 * np.real(
                        U[i + N, n] * np.conj(U[j + N, n])
                        - np.conj(U[i, n]) * U[j, n])
            dia += w * np.tanh(0.5 * beta * E[n]) / N

    # paramagnetic
    lam = 0.0
    for n in range(dim):
        for m in range(dim):
            dE = E[m] - E[n]
            if abs(dE) < 1e-8:
                ratio = beta * f[n] * (1 - f[n])
            else:
                ratio = (f[n] - f[m]) / dE
            lam += ratio * J2[n, m]
    lam /= N

    def lor(x):
        return (1 / np.pi) * eta / (x**2 + eta**2)

    om = spec.omega_grid()
    sig = np.zeros_like(om)
    dc = 0.0
    for n in range(dim):
        for m in range(dim):
            dE = E[m] - E[n]
            dc += beta * f[n] * (1 - f[n]) * J2[n, m] * lor(dE)
            sig += (f[n] - f[m]) / om * J2[n, m] * lor(om - dE)
    dc *= np.pi / N
    sig *= np.pi / N

    dosgrid = spec.dos_grid()
    dos = np.zeros_like(dosgrid)
    dosan = np.zeros_like(dosgrid)
    ak = np.zeros((lat.Lx, lat.Ly))
    p1, p2 = antinodal_phases(lat)
    for n in range(dim):
        w = np.sum(np.abs(U[:N, n]) ** 2)
        dos += w * lor(dosgrid - E[n])
        s1 = np.sum(p1 * U[:N, n])
        s2 = np.sum(p2 * U[:N, n])
        dosan += 0.5 * (abs(s1) ** 2 + abs(s2) ** 2) / N * lor(dosgrid - E[n])
        wz = lor(-E[n])
        if wz > 1e-6:
            ur = np.zeros((lat.Lx, lat.Ly), dtype=np.complex128)
            for i in range(N):
                ur[i % lat.Lx, i // lat.Lx] = U[i, n]
            uk = np.fft.fft2(ur)
            ak += np.abs(uk) ** 2 * wz
    dos /= N
    ak /= N
    return dict(dia=dia, lam=lam, dc=dc, sig=sig, dos=dos, dosan=dosan, ak=ak)


def test_full_spectrum_matches_numpy_oracle():
    params, state = make_state()
    res = jax.jit(measure_transport_and_spectra,
                  static_argnums=(0, 1))(LAT, SPEC, params, state)
    o = numpy_oracle(LAT, SPEC, 1.0, -0.35, 3.0,
                     np.asarray(state.evals), np.asarray(state.evecs))

    np.testing.assert_allclose(float(res.superfluid_stiffness),
                               o["dia"] - o["lam"], atol=1e-9)
    np.testing.assert_allclose(float(res.dc_conductivity), o["dc"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.optical_conductivity), o["sig"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.dos), o["dos"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.dos_AN), o["dosan"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.A_k0), o["ak"], atol=1e-10)


def test_dos_normalization():
    """∫N(ω)dω ≈ 1: total spectral weight Σ_n w_n = N (unitarity of U),
    up to Lorentzian tails outside the grid."""
    params, state = make_state(seed=9)
    spec = SpectralSpec(eta=0.1, domega=0.02, omega_max=12.0)
    res = measure_transport_and_spectra(LAT, spec, params, state,
                                        use_pallas=False)
    integral = float(np.sum(np.asarray(res.dos))) * spec.domega
    # tail mass outside ±ω_max for η=0.1 is ≲ 2·(η/π)/ω_max per state
    np.testing.assert_allclose(integral, 1.0, atol=0.02)


def test_current_operator_hermitian():
    Jp = np.asarray(current_operator_particle(LAT, 1.0, -0.35))
    np.testing.assert_allclose(Jp, Jp.conj().T, atol=1e-14)


def test_current_matrix_elements_unitary_transform():
    """U†JxU must have the same Frobenius norm and trace as Jx."""
    params, state = make_state(seed=4)
    J_mn = np.asarray(current_matrix_elements(LAT, state.evecs, 1.0, -0.35))
    Jp = np.asarray(current_operator_particle(LAT, 1.0, -0.35))
    norm_full = 2 * np.sum(np.abs(Jp) ** 2)  # blockdiag of two copies
    np.testing.assert_allclose(np.sum(np.abs(J_mn) ** 2), norm_full, rtol=1e-10)
    np.testing.assert_allclose(np.trace(J_mn), 2 * np.trace(Jp), atol=1e-10)


def test_clean_normal_state_matches_analytic_drude_weight():
    """Independent dual-formula check in the spirit of
    scripts/debug_transport.jl: for the clean normal metal (Δ=0) the
    eigenstates are plane waves, so dia − Λ_xx must equal the analytic
    Drude weight

        D = (2/N) Σ_k [ ∂²ε/∂kx² · f(ε_k)  −  β f(1−f) · (∂ε/∂kx)² ]

    (the Nambu doubling supplies the factor 2); a d-wave gap then gives a
    strictly larger stiffness."""
    lat = LatticeSpec(8, 8)
    t, tp, mu, beta = 1.0, -0.35, -1.08, 7.0
    params = make_params(t=t, tp=tp, mu=mu, beta=beta, J=1.6, mass=1.0,
                         dtype=jnp.float64)
    spec = SpectralSpec(eta=0.1, domega=0.1, omega_max=0.5)

    def stiffness(delta):
        st = init_chain_state(lat, params, jax.random.PRNGKey(0),
                              delta0=delta, disorder=jnp.zeros(lat.n_sites),
                              dtype=jnp.float64, n_imp=0.0)
        res = measure_transport_and_spectra(lat, spec, params, st)
        return float(res.superfluid_stiffness)

    rho_normal = stiffness(jnp.zeros((lat.n_sites, 2), dtype=jnp.complex128))

    from dwavehmc_tpu.models.lattice import dispersion, k_grid
    kx, ky = k_grid(lat)
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    eps = dispersion(KX, KY, t, tp, mu)
    f = 1.0 / (1.0 + np.exp(beta * eps))
    d2e = 2 * t * np.cos(KX) + 4 * tp * np.cos(KX) * np.cos(KY)
    v = 2 * t * np.sin(KX) + 4 * tp * np.sin(KX) * np.cos(KY)
    drude = (2.0 / lat.n_sites) * np.sum(d2e * f - beta * f * (1 - f) * v**2)
    np.testing.assert_allclose(rho_normal, drude, atol=1e-8)

    rho_sc = stiffness(uniform_dwave_delta(lat, 0.35, dtype=jnp.float64))
    assert rho_sc > rho_normal + 0.05, (rho_sc, rho_normal)


def test_f_sum_rule():
    """Regular-part f-sum: 2·∫_η^{ω_max} σ(ω) dω ≈ π·Λ_xx^offdiag
    (SURVEY §7 step 8).  Grid chosen so the finite-η/ω_max corrections are
    percent-level: ω_max beyond the full transition range (ΔE ≲ 11 at
    these couplings), η small, Δω = 0.2η."""
    from dwavehmc_tpu.models.transport import f_sum_check
    from dwavehmc_tpu.ops.spectral import fermi_factors

    lat = LatticeSpec(6, 6)
    # measured convergence (this exact state): rel err 0.166 → 0.060 →
    # 0.022 → 0.007 → 0.001 at η = .05/.02/.01/.005/.002 — the residual is
    # pure Lorentzian-broadening leakage, vanishing as η → 0
    spec = SpectralSpec(eta=0.005, domega=0.001, omega_max=14.0)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.25,
                         beta=8.0, J=0.8, mass=1.0, dtype=jnp.float64)
    state = init_chain_state(lat, params, jax.random.PRNGKey(3),
                             dtype=jnp.float64, n_imp=0.25)

    from dwavehmc_tpu.models.transport import (
        optical_conductivity,
    )

    f = fermi_factors(state.evals, params.beta)
    J_mn = current_matrix_elements(lat, state.evecs, params.t, params.tp)
    J2 = jnp.abs(J_mn) ** 2
    omega = jnp.asarray(spec.omega_grid(), jnp.float64)
    sigma = optical_conductivity(omega, state.evals, f, J2, spec.eta,
                                 lat.n_sites)
    s_grid, s_pred, rel = f_sum_check(omega, sigma, state.evals, f, J2,
                                      lat.n_sites)
    assert float(s_pred) > 0.01          # non-trivial spectral weight
    assert float(rel) < 0.02, (float(s_grid), float(s_pred), float(rel))

    # loosening the broadening must loosen the agreement (η-controlled)
    spec2 = SpectralSpec(eta=0.02, domega=0.004, omega_max=14.0)
    omega2 = jnp.asarray(spec2.omega_grid(), jnp.float64)
    sigma2 = optical_conductivity(omega2, state.evals, f, J2, spec2.eta,
                                  lat.n_sites)
    _, _, rel2 = f_sum_check(omega2, sigma2, state.evals, f, J2,
                             lat.n_sites)
    assert float(rel2) > float(rel)
