"""BdG assembly tests: Hermiticity, particle–hole symmetry, independent
reconstruction of the reference fill rules, clean-limit analytic spectrum.

Oracle equivalents of src/Hamiltonian.jl:10-114 semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import (
    LatticeSpec,
    assemble_bdg,
    diagonalize,
    make_params,
    neighbor_tables,
    static_hamiltonian,
    uniform_dwave_delta,
)
from dwavehmc_tpu.models.lattice import dispersion, k_grid


def reference_style_bdg(lat, t, tp, mu, disorder, delta):
    """Independent numpy construction following src/Hamiltonian.jl:10-86:
    fill the upper triangle (diag, hopping, pairing) then hermitize."""
    N = lat.n_sites
    nn, nnn = neighbor_tables(lat)
    H = np.zeros((2 * N, 2 * N), dtype=np.complex128)
    for i in range(N):
        term = disorder[i] - mu
        H[i, i] = term
        H[i + N, i + N] = -term
    for i in range(N):
        for d in range(4):
            j = nn[i, d]
            if j > i:
                H[i, j] = -t
                H[i + N, j + N] = t
            j = nnn[i, d]
            if j > i:
                H[i, j] = -tp
                H[i + N, j + N] = tp
    for i in range(N):
        for col, dirn in ((0, 0), (1, 1)):
            j = nn[i, dirn]
            val = 0.5 * delta[i, col]
            H[i, j + N] = val
            H[j, i + N] = val
    # hermitize from the upper triangle (LAPACK :U semantics)
    iu = np.triu_indices(2 * N, 1)
    H[(iu[1], iu[0])] = np.conj(H[iu])
    return H


def build_random(lat, seed=0, W=0.7, n_imp=0.25):
    rng = np.random.default_rng(seed)
    disorder = np.zeros(lat.n_sites)
    idx = rng.permutation(lat.n_sites)[: int(round(lat.n_sites * n_imp))]
    disorder[idx] = W
    delta = rng.normal(size=(lat.n_sites, 2)) + 1j * rng.normal(size=(lat.n_sites, 2))
    return jnp.asarray(disorder), jnp.asarray(delta * 0.3)


def test_matches_reference_fill_rules():
    lat = LatticeSpec(4, 5)
    t, tp, mu = 1.0, -0.35, -1.08
    disorder, delta = build_random(lat)
    H_static = static_hamiltonian(lat, t, tp, mu, disorder)
    H = np.asarray(assemble_bdg(lat, H_static, delta))
    H_ref = reference_style_bdg(lat, t, tp, mu, np.asarray(disorder), np.asarray(delta))
    np.testing.assert_allclose(H, H_ref, atol=1e-14)


def test_hermiticity():
    lat = LatticeSpec(6, 6)
    disorder, delta = build_random(lat, seed=3)
    H_static = static_hamiltonian(lat, 1.0, -0.35, -0.5, disorder)
    H = assemble_bdg(lat, H_static, delta)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H).conj().T, atol=1e-14)


def test_particle_hole_symmetric_spectrum():
    """BdG eigenvalues come in ±E pairs (doc/algorithm.md:106 rationale)."""
    lat = LatticeSpec(6, 4)
    disorder, delta = build_random(lat, seed=5)
    H_static = static_hamiltonian(lat, 1.0, -0.35, -1.08, disorder)
    evals, _ = diagonalize(assemble_bdg(lat, H_static, delta))
    evals = np.sort(np.asarray(evals))
    np.testing.assert_allclose(evals, -evals[::-1], atol=1e-10)


def test_clean_uniform_dwave_analytic_spectrum():
    """Clean lattice + uniform d-wave Δ ⇒ E_k = ±√(ε_k² + Δ_k²) with
    Δ_k = d(cos kx − cos ky)  (cf. scripts/benchmark_clean.jl:26-32)."""
    lat = LatticeSpec(8, 8)
    t, tp, mu, d0 = 1.0, -0.35, -1.08, 0.3
    delta = uniform_dwave_delta(lat, amp=d0, dtype=jnp.float64)
    disorder = jnp.zeros(lat.n_sites)
    H_static = static_hamiltonian(lat, t, tp, mu, disorder)
    evals, _ = diagonalize(assemble_bdg(lat, H_static, delta))

    kx, ky = k_grid(lat)
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    eps = dispersion(KX, KY, t, tp, mu)
    gap = d0 * (np.cos(KX) - np.cos(KY))
    Ek = np.sqrt(eps**2 + gap**2).reshape(-1)
    expected = np.sort(np.concatenate([Ek, -Ek]))
    np.testing.assert_allclose(np.sort(np.asarray(evals)), expected, atol=1e-9)


def test_eigvec_unitarity():
    lat = LatticeSpec(4, 4)
    disorder, delta = build_random(lat, seed=11)
    H_static = static_hamiltonian(lat, 1.0, -0.35, -1.08, disorder)
    H = assemble_bdg(lat, H_static, delta)
    evals, U = diagonalize(H)
    dim = lat.dim
    np.testing.assert_allclose(
        np.asarray(U.conj().T @ U), np.eye(dim), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(U @ jnp.diag(evals) @ U.conj().T), np.asarray(H), atol=1e-10)


def test_traced_params_same_executable():
    """β/t/μ are traced 0-d arrays — two parameter sets, one compile."""
    lat = LatticeSpec(4, 4)
    disorder, delta = build_random(lat, seed=2)

    @jax.jit
    def spectrum(t, tp, mu):
        Hs = static_hamiltonian(lat, t, tp, mu, disorder)
        return diagonalize(assemble_bdg(lat, Hs, delta))[0]

    e1 = spectrum(jnp.float64(1.0), jnp.float64(-0.35), jnp.float64(-1.0))
    e2 = spectrum(jnp.float64(0.9), jnp.float64(-0.2), jnp.float64(-0.5))
    assert not np.allclose(np.asarray(e1), np.asarray(e2))
