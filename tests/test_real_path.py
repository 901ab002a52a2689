"""Complex-free (real-pair) path must reproduce the complex path exactly:
assembly spectrum, forces, full sweeps (same keys ⇒ same decisions),
multi-sweep trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import (
    LatticeSpec,
    assemble_bdg,
    diagonalize,
    hmc_sweep,
    init_chain_state,
    make_params,
    static_hamiltonian,
)
from dwavehmc_tpu.models.bdg_real import (
    assemble_embedding,
    diagonalize_embedding,
    static_embedding,
)
from dwavehmc_tpu.ops.forces import hmc_forces
from dwavehmc_tpu.ops.forces_real import hmc_forces_real
from dwavehmc_tpu.sampler.hmc_real import (
    from_complex_state,
    hmc_sweep_real,
    init_chain_state_real,
)

LAT = LatticeSpec(4, 4)


def setup(seed=0):
    rng = np.random.default_rng(seed)
    N = LAT.n_sites
    disorder = jnp.asarray(rng.uniform(0, 0.5, N))
    dre = jnp.asarray(0.3 * rng.normal(size=(N, 2)))
    dim = jnp.asarray(0.3 * rng.normal(size=(N, 2)))
    return disorder, dre, dim


def test_embedding_matches_complex_assembly():
    disorder, dre, dim = setup()
    t, tp, mu = 1.0, -0.35, -1.08
    H = assemble_bdg(LAT, static_hamiltonian(LAT, t, tp, mu, disorder),
                     dre + 1j * dim)
    M = assemble_embedding(LAT, static_embedding(LAT, t, tp, mu, disorder),
                           dre, dim)
    # M must equal [[Re H, −Im H], [Im H, Re H]]
    d = LAT.dim
    np.testing.assert_allclose(np.asarray(M[:d, :d]), np.asarray(H.real),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(M[d:, d:]), np.asarray(H.real),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(M[d:, :d]), np.asarray(H.imag),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(M[:d, d:]), np.asarray(-H.imag),
                               atol=1e-14)

    e1, _ = diagonalize(H)
    e2, X, Y = diagonalize_embedding(M)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-10)
    # U = X + iY diagonalizes H
    U = np.asarray(X) + 1j * np.asarray(Y)
    np.testing.assert_allclose(np.asarray(H) @ U, U * np.asarray(e2)[None, :],
                               atol=1e-9)


def test_forces_real_match_complex():
    disorder, dre, dim = setup(seed=2)
    t, tp, mu, beta, J = 1.0, -0.35, -1.08, 4.0, 0.8
    delta = dre + 1j * dim
    H = assemble_bdg(LAT, static_hamiltonian(LAT, t, tp, mu, disorder), delta)
    e, U = diagonalize(H)
    F, P = hmc_forces(LAT, delta, e, U, beta, J)

    M = assemble_embedding(LAT, static_embedding(LAT, t, tp, mu, disorder),
                           dre, dim)
    e2, X, Y = diagonalize_embedding(M)
    Fr, Fi, Pr, Pi = hmc_forces_real(LAT, dre, dim, e2, X, Y, beta, J)
    np.testing.assert_allclose(np.asarray(Pr), np.asarray(P.real), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pi), np.asarray(P.imag), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Fr), np.asarray(F.real), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Fi), np.asarray(F.imag), atol=1e-9)


def test_sweep_trajectories_match():
    """Same PRNG key ⇒ identical sweeps (Δ, dH, accept) across both paths."""
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.25,
                         beta=8.0, J=1.0, mass=1.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(5)
    cs = init_chain_state(LAT, params, key, dtype=jnp.float64, n_imp=0.25)
    rs = from_complex_state(cs)

    sweep_c = jax.jit(hmc_sweep, static_argnums=(0, 3))
    sweep_r = jax.jit(hmc_sweep_real, static_argnums=(0, 3))
    for _ in range(5):
        cs, ic = sweep_c(LAT, params, cs, 4, 0.05)
        rs, ir = sweep_r(LAT, params, rs, 4, 0.05)
        assert bool(ic.accepted) == bool(ir.accepted)
        np.testing.assert_allclose(float(ir.dH), float(ic.dH),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(rs.delta_re),
                                   np.asarray(cs.delta.real), atol=1e-9)
        np.testing.assert_allclose(np.asarray(rs.delta_im),
                                   np.asarray(cs.delta.imag), atol=1e-9)
        np.testing.assert_allclose(np.asarray(rs.evals),
                                   np.asarray(cs.evals), atol=1e-9)


def test_init_real_matches_complex_init():
    params = make_params(W=0.5, n_imp=0.25, beta=5.0, J=1.0,
                         dtype=jnp.float64)
    key = jax.random.PRNGKey(9)
    cs = init_chain_state(LAT, params, key, dtype=jnp.float64, n_imp=0.25)
    rs = init_chain_state_real(LAT, params, key, dtype=jnp.float64,
                               n_imp=0.25)
    np.testing.assert_allclose(np.asarray(rs.delta_re),
                               np.asarray(cs.delta.real), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rs.delta_im),
                               np.asarray(cs.delta.imag), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(rs.disorder),
                                  np.asarray(cs.disorder))
    np.testing.assert_allclose(np.asarray(rs.evals), np.asarray(cs.evals),
                               atol=1e-10)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rs.key)),
        np.asarray(jax.random.key_data(cs.key)))
