"""PH-split eigensolver (ops/ph_eigh.py) vs the QDWH oracle.

The solver's claims, each checked against assembled BdG embeddings with
disorder (not synthetic random matrices):
 * the PH map S anticommutes with the embedding exactly,
 * eigenvalues match jnp.linalg.eigh to f32-oracle accuracy,
 * eigenvectors are valid (small residual, orthonormal) and all
   phase-invariant downstream quantities match the oracle,
 * the batched (vmapped) form agrees with the single-matrix form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwavehmc_tpu.models import bdg_real
from dwavehmc_tpu.models.lattice import LatticeSpec
from dwavehmc_tpu.ops.ph_eigh import (
    diagonalize_embedding_ph,
    ph_reflect,
    sign_embedding,
)


def _embedding(L=8, seed=1, amp=0.05, W=0.5, dtype=jnp.float32):
    lat = LatticeSpec(L, L)
    N = lat.n_sites
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    dis = jax.random.uniform(k1, (N,), minval=-W, maxval=W)
    dre = jax.random.normal(k2, (N, 2)) * amp + 0.04
    dim_ = jax.random.normal(k3, (N, 2)) * amp
    M = bdg_real.assemble_embedding(
        lat, bdg_real.static_embedding(lat, 1.0, -0.35, -1.08, dis),
        dre, dim_)
    return lat, M.astype(dtype)


def test_ph_map_anticommutes_exactly():
    _, M = _embedding(L=6, seed=3)
    d = M.shape[0]
    SMS = ph_reflect(ph_reflect(M.T).T)      # S M Sᵀ via column/row maps
    np.testing.assert_array_equal(np.asarray(SMS), -np.asarray(M))
    # involution up to overall sign: S(Sv) = -v
    V = jax.random.normal(jax.random.PRNGKey(0), (d, 3))
    np.testing.assert_array_equal(np.asarray(ph_reflect(ph_reflect(V))),
                                  -np.asarray(V))


def test_sign_matches_spectral_sign():
    _, M = _embedding(L=6, seed=5)
    w, V = np.linalg.eigh(np.asarray(M, dtype=np.float64))
    sgn_true = (V * np.sign(w)[None, :]) @ V.T
    sgn = np.asarray(sign_embedding(M), dtype=np.float64)
    assert np.abs(sgn - sgn_true).max() < 5e-5


@pytest.mark.parametrize("orth", ["chol", "ns"])
def test_ph_eigh_matches_oracle(orth):
    _, M = _embedding(L=8, seed=1)
    d4 = M.shape[0]
    w_ref, X_ref, Y_ref = bdg_real.diagonalize_embedding(M)
    w, X, Y = diagonalize_embedding_ph(M, orth=orth)
    scale = float(jnp.abs(w_ref).max())

    # eigenvalues: ascending, one per doubled level, oracle-accurate
    assert np.all(np.diff(np.asarray(w)) > -1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               atol=5e-5 * scale)

    # eigenvectors: unit-norm, orthogonal, small residual on the
    # embedding (M [x; y] = E [x; y])
    V = jnp.concatenate([X, Y], axis=0)                     # (4N, 2N)
    g = np.asarray(V.T @ V)
    np.testing.assert_allclose(g, np.eye(d4 // 2), atol=5e-4)
    R = np.asarray(M @ V - V * w[None, :])
    assert np.abs(R).max() < 5e-3 * scale
    assert np.linalg.norm(R, axis=0).max() < 5e-3 * scale


def test_ph_eigh_phase_invariant_observables_match():
    """Density matrix ρ = Σ_E<0 u u† and |u|² site weights (the inputs to
    every observable) must match the oracle decomposition."""
    _, M = _embedding(L=8, seed=7)
    w_ref, X_ref, Y_ref = bdg_real.diagonalize_embedding(M)
    w, X, Y = diagonalize_embedding_ph(M)
    neg_ref = np.asarray(w_ref) < 0
    neg = np.asarray(w) < 0
    assert neg.sum() == neg_ref.sum()

    def rho(X, Y, m):
        Xm, Ym = np.asarray(X)[:, m], np.asarray(Y)[:, m]
        return (Xm @ Xm.T + Ym @ Ym.T,          # Re Σ u u†
                Ym @ Xm.T - Xm @ Ym.T)          # Im Σ u u†
    r_re, r_im = rho(X, Y, neg)
    o_re, o_im = rho(X_ref, Y_ref, neg_ref)
    np.testing.assert_allclose(r_re, o_re, atol=2e-3)
    np.testing.assert_allclose(r_im, o_im, atol=2e-3)

    wgt = np.asarray(X**2 + Y**2)
    wgt_ref = np.asarray(X_ref**2 + Y_ref**2)
    # per-level |u_i|² site weights are phase-invariant but not
    # degeneracy-rotation-invariant; compare level-summed weights in
    # narrow energy windows instead
    bins = np.linspace(float(w_ref.min()) - 0.1, float(w_ref.max()) + 0.1, 40)
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = (np.asarray(w) >= lo) & (np.asarray(w) < hi)
        m_ref = (np.asarray(w_ref) >= lo) & (np.asarray(w_ref) < hi)
        np.testing.assert_allclose(wgt[:, m].sum(axis=1),
                                   wgt_ref[:, m_ref].sum(axis=1), atol=5e-3)


def test_ph_eigh_batched_matches_single():
    _, M0 = _embedding(L=6, seed=11)
    _, M1 = _embedding(L=6, seed=12)
    Mb = jnp.stack([M0, M1])
    wb, Xb, Yb = jax.vmap(diagonalize_embedding_ph)(Mb)
    for i, M in enumerate((M0, M1)):
        w, X, Y = diagonalize_embedding_ph(M)
        np.testing.assert_allclose(np.asarray(wb[i]), np.asarray(w),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(Xb[i]), np.asarray(X),
                                   atol=1e-6)


def test_ph_eigh_nonfinite_guard():
    """Non-finite input must not reach the inner eigh (TPU worker-crash
    contract, sampler/hmc_real._finite_or_zero)."""
    _, M = _embedding(L=6, seed=2)
    M = M.at[0, 0].set(jnp.nan)
    w, X, Y = diagonalize_embedding_ph(M)
    # output may be garbage but must be finite-shaped, not crash
    assert w.shape[0] == M.shape[0] // 2


def test_tracked_segment_ph_anchor_matches_qdwh():
    """run_segment_tracked(exact_solver="ph") must reproduce the QDWH-
    anchored segment: same acceptances and dH to solver tolerance (the
    anchor eigensolvers agree to ~1e-5, so Metropolis decisions coincide
    except on razor-edge proposals — none at this scale)."""
    import jax.numpy as jnp

    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real,
        run_segment_tracked,
    )

    lat = LatticeSpec(6, 6)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.05,
                         beta=5.0, J=0.8, mass=1.0)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(3), 2,
                                dtype=jnp.float32, n_imp=0.05)
    dt = jnp.full((2,), 0.05, dtype=jnp.float32)

    outs = {}
    for solver in ("qdwh", "ph"):
        st, seg = run_segment_tracked(lat, params, states, 4, 5, dt,
                                      True, None, 0, 6, 1, 12, 4, 2, None,
                                      8, solver)
        outs[solver] = (np.asarray(seg.accepted), np.asarray(seg.dH),
                        np.asarray(st.evals))
    np.testing.assert_array_equal(outs["ph"][0], outs["qdwh"][0])
    np.testing.assert_allclose(outs["ph"][1], outs["qdwh"][1], atol=2e-4)
    np.testing.assert_allclose(outs["ph"][2], outs["qdwh"][2], atol=1e-4)


def test_init_chain_state_ph_matches_qdwh():
    """init_chain_state_real(exact_solver="ph") must produce the same
    starting spectrum as the QDWH init (plumbing: hmc_real.py
    init_chain_state_real -> _exact_diagonalize)."""
    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.sampler.hmc_real import init_chain_state_real

    lat = LatticeSpec(6, 6)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.05,
                         beta=5.0, J=0.8, mass=1.0)
    key = jax.random.PRNGKey(7)
    s_q = init_chain_state_real(lat, params, key, dtype=jnp.float32,
                                n_imp=0.05)
    s_p = init_chain_state_real(lat, params, key, dtype=jnp.float32,
                                n_imp=0.05, exact_solver="ph")
    np.testing.assert_array_equal(np.asarray(s_q.delta_re),
                                  np.asarray(s_p.delta_re))
    np.testing.assert_allclose(np.sort(np.asarray(s_p.evals)),
                               np.sort(np.asarray(s_q.evals)), atol=1e-4)


def test_minimax_schedules_converge_on_their_interval():
    """Each embedded schedule maps [floor, 1] into a tight band around 1
    (scalar composition — the matrix iteration applies these to |E|/λ)."""
    from dwavehmc_tpu.ops.ph_eigh import minimax_schedule

    for floor, tol in ((1e-3, 6e-3), (1e-4, 1e-3), (1e-5, 2e-4)):
        xs = np.concatenate([[floor, 2 * floor], np.linspace(0.01, 1.0, 997)])
        for a, b, c in minimax_schedule(floor):
            xs = a * xs + b * xs**3 + c * xs**5
        assert np.abs(xs - 1).max() < tol, (floor, np.abs(xs - 1).max())


def test_minimax_schedule_selection():
    from dwavehmc_tpu.ops.ph_eigh import (
        _MINIMAX_1E3,
        _MINIMAX_1E5,
        minimax_schedule,
    )

    assert minimax_schedule(1e-3) is _MINIMAX_1E3
    assert minimax_schedule(5e-3) is _MINIMAX_1E3      # shallowest valid
    assert minimax_schedule(1e-5) is _MINIMAX_1E5
    with pytest.raises(ValueError):
        minimax_schedule(1e-7)


def test_ph_eigh_shallow_floor_matches_oracle():
    """floor=1e-3 schedule: full solver still matches the f64 oracle when
    the spectrum respects the floor."""
    from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph

    _, M = _embedding(L=6, seed=5)
    w64 = np.linalg.eigvalsh(np.asarray(M, np.float64))
    lam = np.abs(M).sum(axis=-1).max()
    assert np.abs(w64).min() / lam > 1e-3   # precondition of the schedule
    evals, X, Y = diagonalize_embedding_ph(M, floor=1e-3)
    # doubled-levels convention: one eigenpair per doubled level
    np.testing.assert_allclose(np.asarray(evals), w64[::2], atol=2e-4)


# --- floor-guarded default-safe path (VERDICT r4 item 3) -------------------

def _gapless_embedding(L=4, dtype=jnp.float32):
    """Clean normal-state BdG at μ=0, t'=0, Δ=0: the single-particle band
    ε(k) = −2t(cos kx + cos ky) has EXACT zeros (k with kx+ky=π), so the
    embedding spectrum touches 0 — far below the minimax schedule's
    1e-5·‖M‖ floor.  This is the spectrum class where the unguarded PH
    solver silently diverges."""
    lat = LatticeSpec(L, L)
    N = lat.n_sites
    z = jnp.zeros((N, 2), dtype)
    M = bdg_real.assemble_embedding(
        lat, bdg_real.static_embedding(lat, 1.0, 0.0, 0.0,
                                       jnp.zeros((N,), dtype)), z, z)
    return lat, M.astype(dtype)


def test_guarded_ph_falls_back_on_gapless_spectrum():
    from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph_guarded

    _, M = _gapless_embedding()
    ev, X, Y, fb = diagonalize_embedding_ph_guarded(M)
    assert bool(fb), "guard must detect the below-floor spectrum"
    # fallback results are the QDWH path's, bit-for-bit
    ev0, X0, Y0 = bdg_real.diagonalize_embedding(M)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev0))
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X0))
    np.testing.assert_array_equal(np.asarray(Y), np.asarray(Y0))


def test_guarded_ph_uses_ph_on_healthy_spectrum():
    from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph_guarded

    _, M = _embedding(L=6, seed=2, amp=0.02)
    ev, X, Y, fb = diagonalize_embedding_ph_guarded(M)
    assert not bool(fb)
    ev_ph, _, _ = diagonalize_embedding_ph(M)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev_ph))
    w_oracle = np.linalg.eigvalsh(np.asarray(M, np.float64))[::2]
    assert np.abs(np.asarray(ev, np.float64) - w_oracle).max() < 5e-5


def test_guarded_ph_batched_mixed_batch_falls_back():
    """One bad chain in the batch → the whole batch takes the QDWH branch
    (the guard is a single batch-level scalar by design)."""
    from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph_guarded

    _, M_good = _embedding(L=4, seed=2, amp=0.05)
    _, M_bad = _gapless_embedding(L=4)
    M = jnp.stack([M_good, M_bad])
    ev, X, Y, fb = diagonalize_embedding_ph_guarded(M)
    assert bool(fb)
    ev0, _, _ = bdg_real.diagonalize_embedding(M)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev0))


def test_init_ensemble_ph_guarded_matches_qdwh_init():
    """init_ensemble_real(exact_solver='ph') now goes through the guarded
    batched solve; the resulting eigenpairs must agree with the QDWH init
    on phase-invariant quantities."""
    import functools

    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import init_ensemble_real

    lat = LatticeSpec(4, 4)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.6, n_imp=0.25,
                         beta=5.0, J=0.8, mass=1.0, dtype=jnp.float32)
    mk = functools.partial(init_ensemble_real, lat, params,
                           jax.random.PRNGKey(11), 3, dtype=jnp.float32,
                           n_imp=0.25)
    s_ph = mk(exact_solver="ph")
    s_qd = mk(exact_solver="qdwh")
    np.testing.assert_allclose(np.asarray(s_ph.evals),
                               np.asarray(s_qd.evals), atol=5e-5)
    # projector onto the positive subspace is phase/basis invariant
    for k in range(3):
        for s in (s_ph, s_qd):
            assert np.isfinite(np.asarray(s.X[k])).all()
    # also via chunked init
    s_ph2 = mk(exact_solver="ph", init_chunk=2)
    np.testing.assert_allclose(np.asarray(s_ph2.evals),
                               np.asarray(s_ph.evals), atol=5e-5)
