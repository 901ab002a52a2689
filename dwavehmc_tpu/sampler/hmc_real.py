"""Complex-free HMC sweep — the TPU production path.

Identical sampling semantics to sampler/hmc.py (same leapfrog conventions,
same Metropolis, same per-chain keys; reference src/HMC.jl:71-144) but all
state is real: fields/momenta as (re, im) pairs and the BdG problem as the
real-symmetric embedding (models/bdg_real.py).  Exact agreement with the
complex path is enforced by tests/test_real_path.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.bdg_real import (
    assemble_embedding,
    assemble_parts,
    diagonalize_embedding,
    static_embedding,
)
from ..models.lattice import LatticeSpec
from ..models.params import ModelParams
from ..ops.forces_real import hmc_forces_real
from .hmc import SweepInfo, calc_optimal_dt  # noqa: F401  (re-export)


class HMCStateReal(NamedTuple):
    """Real-pair Markov state.  X + iY are the complex eigenvector parts."""

    delta_re: jax.Array    # (N, 2)
    delta_im: jax.Array
    pi_re: jax.Array       # (N, 2)
    pi_im: jax.Array
    disorder: jax.Array    # (N,)
    evals: jax.Array       # (2N,)
    X: jax.Array           # (2N, 2N)
    Y: jax.Array           # (2N, 2N)
    key: jax.Array


def from_complex_state(state) -> HMCStateReal:
    """Convert an HMCState (complex leaves) to the real-pair layout."""
    return HMCStateReal(
        delta_re=state.delta.real, delta_im=state.delta.imag,
        pi_re=state.pi.real, pi_im=state.pi.imag,
        disorder=state.disorder, evals=state.evals,
        X=state.evecs.real, Y=state.evecs.imag, key=state.key)


def init_chain_state_real(lat: LatticeSpec, params: ModelParams, key, *,
                          dtype=jnp.float32, n_imp: float | None = None,
                          delta0_re=None, delta0_im=None,
                          disorder=None,
                          exact_solver: str = "qdwh",
                          diagonalize: bool = True) -> HMCStateReal:
    """``diagonalize=False`` returns the state with ZERO eigenpairs — for
    callers that diagonalize the whole batch afterwards outside vmap (the
    floor-guarded PH init in parallel/ensemble.init_ensemble_real)."""
    from ..models.params import sample_disorder

    k_dis, k_delta, k_chain = jax.random.split(key, 3)
    N = lat.n_sites
    if disorder is None:
        frac = float(params.n_imp) if n_imp is None else float(n_imp)
        disorder = sample_disorder(k_dis, lat, params.W, frac, dtype=dtype)
    disorder = disorder.astype(dtype)
    if delta0_re is None:
        u = jax.random.uniform(k_delta, (2, N, 2), dtype=dtype) - 0.5
        delta0_re, delta0_im = 0.1 * u[0], 0.1 * u[1]
    delta0_re = delta0_re.astype(dtype)
    delta0_im = (jnp.zeros_like(delta0_re) if delta0_im is None
                 else delta0_im.astype(dtype))

    if diagonalize:
        M = assemble_embedding(
            lat, static_embedding(lat, params.t, params.tp, params.mu,
                                  disorder),
            delta0_re, delta0_im)
        evals, X, Y = _exact_diagonalize(M, exact_solver)
    else:
        dim = 2 * N
        evals = jnp.zeros((dim,), dtype)
        X = jnp.zeros((dim, dim), dtype)
        Y = jnp.zeros((dim, dim), dtype)
    z = jnp.zeros_like(delta0_re)
    return HMCStateReal(delta0_re, delta0_im, z, z, disorder,
                        evals, X, Y, k_chain)


def _energy_terms(delta_re, delta_im, pi_re, pi_im, evals, beta, J, mass):
    kin = jnp.sum(pi_re**2 + pi_im**2) / (2.0 * mass)
    bos = (beta / (2.0 * J)) * jnp.sum(delta_re**2 + delta_im**2)
    # Fermion term via the PH-even all-levels/2 form: g(E) = β|E| +
    # 2·softplus(−β|E|) summed over EVERY level and halved.  Exactly equal
    # to the reference's Σ_{E>0} form (src/HMC.jl:21-27) under ±E pairing,
    # but invariant under permutation and per-level sign noise — ``evals``
    # may be an UNSORTED tracked spectrum during cheap-anchor sweeps, where
    # sign noise on the near-zero PH pair would make the E>0 restriction
    # mis-count a level (contributing a spurious ±2·log 2 to the logged
    # H_old / Energy column even though dH itself was already robust).
    x = beta * jnp.abs(evals)
    fer = -0.5 * jnp.sum(x + 2.0 * jax.nn.softplus(-x))
    return kin + bos + fer


def _finite_or_zero(x):
    """NaN/Inf guard ahead of eigh: the TPU QDWH eigh hard-crashes the
    worker on non-finite input, so any diverged trajectory is zeroed here
    (and rejected by the accept step's finiteness check)."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def tracked_leapfrog(lat: LatticeSpec, params: ModelParams,
                     state: HMCStateReal, Nt: int, dt,
                     tracked_iters: int = 6, refine_iters: int = 0,
                     polish_iters: int = 6, ns_steps: int = 2,
                     rot_dtype=None, polish_precision: str = "highest",
                     polish_correction: bool = False,
                     unroll: int = 1, rot_scheme: str = "ns",
                     use_pallas_s: bool = False):
    """Phase 1 of the split tracked sweep: momentum refresh + fully tracked
    leapfrog (no exact eigh anywhere — the target TPU compiler faults when
    the embedding eigh and the tracked matmul loop share one program).

    ``refine_iters`` > 0 adds extra refinement at the trajectory endpoint
    so the tracked spectrum there is tight enough to serve as a cheap
    Metropolis anchor (see tracked_accept_cheap).  The endpoint runs in
    two phases: ``refine_iters`` rotations at the fast default (bf16-pass)
    MXU rate converge the basis to the bf16 noise floor (~2e-2 absolute
    off-diagonal at 16×16), then ``polish_iters`` rotations at
    precision="highest" contract it to the f32 floor — measured on-TPU:
    default-precision-only rotations leave eigenvalue errors ~r²/gap that
    sum to dH errors of ~8 at β=10 (acceptance collapse), while a short
    highest-precision polish restores exact-anchor-grade dH.

    Returns (proposal fields/momenta, pi0, key', k_acc, max residual,
    endpoint evals/X/Y, endpoint residual).
    """
    from ..models.bdg import static_hamiltonian

    beta, J, mass = params.beta, params.J, params.mass
    rdt = state.evals.dtype

    key, k_mom, k_acc = jax.random.split(state.key, 3)
    n = jax.random.normal(k_mom, (2,) + state.delta_re.shape, dtype=rdt)
    scale = jnp.sqrt(mass).astype(rdt)
    pi_re0, pi_im0 = n[0] * scale, n[1] * scale

    Hs_real = static_hamiltonian(lat, params.t, params.tp, params.mu,
                                 state.disorder)
    dt = jnp.asarray(dt, rdt)
    coef = dt / (2.0 * mass)

    from ..ops.tracked_eigh import tracked_eigh_nofallback

    F_re0, F_im0, _, _ = hmc_forces_real(
        lat, state.delta_re, state.delta_im, state.evals, state.X, state.Y,
        beta, J)
    pi_re = pi_re0 + 0.5 * dt * F_re0
    pi_im = pi_im0 + 0.5 * dt * F_im0

    def step(carry, _):
        dre, dim_, pre, pim, e, X, Y, _Fr, _Fi = carry
        dre = _finite_or_zero(dre + coef * pre)
        dim_ = _finite_or_zero(dim_ + coef * pim)
        hr, hi = assemble_parts(lat, Hs_real, dre, dim_)
        e, X, Y, res = tracked_eigh_nofallback(hr, hi, X, Y,
                                               n_iter=tracked_iters,
                                               ns_steps=ns_steps,
                                               rot_dtype=rot_dtype,
                                               rot_scheme=rot_scheme,
                                               use_pallas_s=use_pallas_s)
        Fr, Fi, _, _ = hmc_forces_real(lat, dre, dim_, e, X, Y, beta, J)
        pre = pre + dt * Fr
        pim = pim + dt * Fi
        return (dre, dim_, pre, pim, e, X, Y, Fr, Fi), res

    carry0 = (state.delta_re, state.delta_im, pi_re, pi_im,
              state.evals, state.X, state.Y, F_re0, F_im0)
    # ``unroll``: the profiler measured 9.8% of production device time in
    # while-loop bookkeeping (examples/profile_production.json); unrolling
    # the Nt-step leapfrog trades program size for that overhead
    (dre, dim_, pre, pim, e_f, X_f, Y_f, Fr_l, Fi_l), res = lax.scan(
        step, carry0, None, length=Nt, unroll=unroll)
    pre = pre - 0.5 * dt * Fr_l
    pim = pim - 0.5 * dt * Fi_l

    res_end = res[-1]
    if refine_iters > 0 or polish_iters > 0:
        hr, hi = assemble_parts(lat, Hs_real,
                                _finite_or_zero(dre), _finite_or_zero(dim_))
        if refine_iters > 0:
            # phase 1: fast rotations to the bf16 noise floor (readout
            # precision only matters when no polish follows).  Endpoint
            # phases keep the conservative ns=2 re-unitarization: the
            # Metropolis spectrum is read from this basis, and measured
            # on-TPU ns=1 here collapses cheap-anchor acceptance
            # (0.88 → 0.51 at 16×16/b8) even with the highest-precision
            # polish following — the configurable ``ns_steps`` applies to
            # the in-trajectory rotations only, where exact anchors show
            # trajectory quality is unaffected.
            e_f, X_f, Y_f, res_end = tracked_eigh_nofallback(
                hr, hi, X_f, Y_f, n_iter=refine_iters,
                eval_precision="highest" if polish_iters == 0 else None,
                eval_correction=polish_correction and polish_iters == 0,
                rot_scheme=rot_scheme, use_pallas_s=use_pallas_s)
        if polish_iters > 0:
            # phase 2: full-precision polish to the f32 floor +
            # Metropolis-grade eigenvalue readout.  ``polish_precision``
            # sets the ROTATION matmuls only ("high" = 3 MXU passes vs
            # "highest" = 6): basis noise enters eigenvalues at second
            # order (~res²/gap), so the readout — always "highest" — is
            # what bounds the dH error.
            # ``polish_correction`` applies the O(n²) second-order
            # Rayleigh eigenvalue correction to the readout, removing the
            # leading O(res²/gap) error — lets polish_iters shrink at the
            # same dH floor (validate on hardware before changing
            # defaults; see scripts/validate_cheap_anchor.py).
            e_f, X_f, Y_f, res_end = tracked_eigh_nofallback(
                hr, hi, X_f, Y_f, n_iter=polish_iters,
                precision=polish_precision, eval_precision="highest",
                eval_correction=polish_correction,
                rot_scheme=rot_scheme, use_pallas_s=use_pallas_s)

    return (dre, dim_, pre, pim, pi_re0, pi_im0, key,
            k_acc, jnp.max(res), e_f, X_f, Y_f, res_end)


def tracked_accept_cheap(lat: LatticeSpec, params: ModelParams,
                         state: HMCStateReal, proposal
                         ) -> tuple[HMCStateReal, SweepInfo]:
    """Cheap anchor: Metropolis from the *refined tracked* endpoint spectrum
    (no exact eigh at all).  Bias is controlled by the endpoint residual —
    use refine_iters ≥ ~12 in tracked_leapfrog and interleave exact anchors
    every few sweeps (run_segment_tracked(anchor_every=K))."""
    beta, J, mass = params.beta, params.J, params.mass
    (dre, dim_, pre, pim, pi_re0, pi_im0, key, k_acc, _res,
     e_f, X_f, Y_f, _res_end) = proposal

    H_old = _energy_terms(state.delta_re, state.delta_im, pi_re0, pi_im0,
                          state.evals, beta, J, mass)

    finite = (jnp.all(jnp.isfinite(dre)) & jnp.all(jnp.isfinite(dim_))
              & jnp.all(jnp.isfinite(pre)) & jnp.all(jnp.isfinite(pim))
              & jnp.all(jnp.isfinite(e_f)))
    dre_s = _finite_or_zero(dre)
    dim_s = _finite_or_zero(dim_)

    d_kin = jnp.sum(pre**2 + pim**2 - pi_re0**2 - pi_im0**2) / (2.0 * mass)
    d_bos = (beta / (2.0 * J)) * jnp.sum(
        dre**2 + dim_**2 - state.delta_re**2 - state.delta_im**2)
    # tracked evals are unsorted: use |E| of ALL levels / 2 via the even
    # function g(E) = |βE| + 2·softplus(−|βE|), summing every level once
    # and halving (PH symmetry makes each pair contribute twice)
    En = jnp.abs(_finite_or_zero(e_f))
    Eo = jnp.abs(state.evals)
    d_fer = -0.5 * (beta * (jnp.sum(En) - jnp.sum(Eo))
                    + 2.0 * (jnp.sum(jax.nn.softplus(-beta * En))
                             - jnp.sum(jax.nn.softplus(-beta * Eo))))
    dH = d_kin + d_bos + d_fer
    H_new = H_old + dH

    u = jax.random.uniform(k_acc, (), dtype=jnp.float32)
    accept = finite & ((dH < 0) | (u < jnp.exp(-dH.astype(jnp.float32))))

    def sel(new, old):
        return jnp.where(accept, new, old)

    new_state = HMCStateReal(
        delta_re=sel(dre_s, state.delta_re),
        delta_im=sel(dim_s, state.delta_im),
        pi_re=_finite_or_zero(pre), pi_im=_finite_or_zero(pim),
        disorder=state.disorder,
        evals=sel(_finite_or_zero(e_f), state.evals),
        X=sel(_finite_or_zero(X_f), state.X),
        Y=sel(_finite_or_zero(Y_f), state.Y), key=key)
    return new_state, SweepInfo(accepted=accept, dH=dH, H_old=H_old,
                                H_new=H_new)


def _exact_diagonalize(M, solver: str = "qdwh"):
    """Anchor/init eigensolver switch: "qdwh" = XLA's eigh on the full
    embedding, "ph" = the PH-split half-dimension solver
    (ops/ph_eigh.diagonalize_embedding_ph — ~8x less eigh work)."""
    if solver == "ph":
        from ..ops.ph_eigh import diagonalize_embedding_ph

        return diagonalize_embedding_ph(M)
    return diagonalize_embedding(M)


def tracked_accept(lat: LatticeSpec, params: ModelParams,
                   state: HMCStateReal, proposal,
                   exact_solver: str = "qdwh",
                   dH_host=None, finite_host=None, eig_new=None
                   ) -> tuple[HMCStateReal, SweepInfo]:
    """Phase 2: exact embedding eigh of the proposal, difference-based ΔH,
    Metropolis select.  Runs as its own program (see tracked_leapfrog).

    ``dH_host`` (with ``finite_host``) overrides the device-computed ΔH in
    the Metropolis test — the host-f64 readout path (ops/host_energy.py)
    for β beyond the f32 conditioning wall.  The exact eigh still runs:
    the accepted state must carry anchor-grade eigenpairs for forces,
    observables and transport; only the accept DECISION uses the host
    energies.

    ``eig_new``: precomputed ``(evals, X, Y)`` of the proposal's BdG
    matrix, skipping the internal diagonalization — the floor-guarded PH
    anchor path computes the batch's eigenpairs OUTSIDE the per-chain
    vmap (its ``lax.cond`` fallback must not lower to select;
    parallel/ensemble._tracked_accept_jit)."""
    beta, J, mass = params.beta, params.J, params.mass
    dre, dim_, pre, pim, pi_re0, pi_im0, key, k_acc, res = proposal[:9]

    H_old = _energy_terms(state.delta_re, state.delta_im, pi_re0, pi_im0,
                          state.evals, beta, J, mass)

    finite = (jnp.all(jnp.isfinite(dre)) & jnp.all(jnp.isfinite(dim_))
              & jnp.all(jnp.isfinite(pre)) & jnp.all(jnp.isfinite(pim)))
    dre_s = _finite_or_zero(dre)
    dim_s = _finite_or_zero(dim_)

    if eig_new is not None:
        evals_n, X_n, Y_n = eig_new
    else:
        M_static = static_embedding(lat, params.t, params.tp, params.mu,
                                    state.disorder)
        M = assemble_embedding(lat, M_static, dre_s, dim_s)
        evals_n, X_n, Y_n = _exact_diagonalize(M, exact_solver)

    d_kin = jnp.sum(pre**2 + pim**2 - pi_re0**2 - pi_im0**2) / (2.0 * mass)
    d_bos = (beta / (2.0 * J)) * jnp.sum(
        dre**2 + dim_**2 - state.delta_re**2 - state.delta_im**2)
    # all-levels/2 form of the positive-branch sum: valid for ANY eigenvalue
    # order (state.evals may be an unsorted tracked spectrum when cheap
    # anchors are interleaved), exactly equal under PH symmetry
    En = jnp.abs(evals_n)
    Eo = jnp.abs(state.evals)
    d_fer = -0.5 * (beta * (jnp.sum(En) - jnp.sum(Eo))
                    + 2.0 * (jnp.sum(jax.nn.softplus(-beta * En))
                             - jnp.sum(jax.nn.softplus(-beta * Eo))))
    dH = d_kin + d_bos + d_fer
    if dH_host is not None:
        dH = jnp.asarray(dH_host, jnp.float32)
        if finite_host is not None:
            finite = finite & finite_host
    H_new = H_old + dH

    u = jax.random.uniform(k_acc, (), dtype=jnp.float32)
    accept = finite & ((dH < 0) | (u < jnp.exp(-dH.astype(jnp.float32))))

    def sel(new, old):
        return jnp.where(accept, new, old)

    new_state = HMCStateReal(
        delta_re=sel(dre_s, state.delta_re),
        delta_im=sel(dim_s, state.delta_im),
        pi_re=_finite_or_zero(pre), pi_im=_finite_or_zero(pim),
        disorder=state.disorder,
        evals=sel(evals_n, state.evals), X=sel(X_n, state.X),
        Y=sel(Y_n, state.Y), key=key)
    return new_state, SweepInfo(accepted=accept, dH=dH, H_old=H_old,
                                H_new=H_new)


def hmc_sweep_real(lat: LatticeSpec, params: ModelParams,
                   state: HMCStateReal, Nt: int, dt,
                   eigh_mode: str = "exact", tracked_iters: int = 6
                   ) -> tuple[HMCStateReal, SweepInfo]:
    """One HMC trajectory + Metropolis.

    ``eigh_mode``:
      * "exact"   — every leapfrog step runs the exact embedding eigh.
      * "tracked" — leapfrog steps refine the carried eigenbasis with the
        warm-started matmul solver (ops/tracked_eigh.py, ``tracked_iters``
        rotations, no per-step fallback so it stays vmap-efficient); ONE
        exact eigh at trajectory end re-anchors the basis and supplies
        Metropolis-grade energies.  Force errors ~ the tracked residual
        only perturb the proposal; dH is computed from exact spectra, so
        inaccurate trajectories are simply rejected rather than biasing
        the ensemble.
    """
    beta, J, mass = params.beta, params.J, params.mass
    rdt = state.evals.dtype

    key, k_mom, k_acc = jax.random.split(state.key, 3)
    n = jax.random.normal(k_mom, (2,) + state.delta_re.shape, dtype=rdt)
    scale = jnp.sqrt(mass).astype(rdt)
    pi_re0, pi_im0 = n[0] * scale, n[1] * scale

    H_old = _energy_terms(state.delta_re, state.delta_im, pi_re0, pi_im0,
                          state.evals, beta, J, mass)

    Hs_real = None
    if eigh_mode == "tracked":
        from ..models.bdg import static_hamiltonian
        from ..ops.tracked_eigh import tracked_eigh_nofallback
        Hs_real = static_hamiltonian(lat, params.t, params.tp, params.mu,
                                     state.disorder)
    M_static = static_embedding(lat, params.t, params.tp, params.mu,
                                state.disorder)
    dt = jnp.asarray(dt, rdt)
    coef = dt / (2.0 * mass)

    F_re0, F_im0, _, _ = hmc_forces_real(
        lat, state.delta_re, state.delta_im, state.evals, state.X, state.Y,
        beta, J)
    pi_re = pi_re0 + 0.5 * dt * F_re0
    pi_im = pi_im0 + 0.5 * dt * F_im0

    def step(carry, _):
        dre, dim_, pre, pim, _e, X, Y, _Fr, _Fi, _res = carry
        dre = _finite_or_zero(dre + coef * pre)
        dim_ = _finite_or_zero(dim_ + coef * pim)
        if eigh_mode == "tracked":
            hr, hi = assemble_parts(lat, Hs_real, dre, dim_)
            evals, X, Y, res = tracked_eigh_nofallback(
                hr, hi, X, Y, n_iter=tracked_iters)
        else:
            M = assemble_embedding(lat, M_static, dre, dim_)
            evals, X, Y = diagonalize_embedding(M)
            res = jnp.zeros((), rdt)
        Fr, Fi, _, _ = hmc_forces_real(lat, dre, dim_, evals, X, Y, beta, J)
        pre = pre + dt * Fr
        pim = pim + dt * Fi
        return (dre, dim_, pre, pim, evals, X, Y, Fr, Fi, res), res

    carry0 = (state.delta_re, state.delta_im, pi_re, pi_im,
              state.evals, state.X, state.Y, F_re0, F_im0,
              jnp.zeros((), rdt))
    (dre, dim_, pre, pim, evals_n, X_n, Y_n, Fr_l, Fi_l, _), _ = lax.scan(
        step, carry0, None, length=Nt)
    pre = pre - 0.5 * dt * Fr_l
    pim = pim - 0.5 * dt * Fi_l

    if eigh_mode == "tracked":
        # re-anchor: exact spectrum at trajectory end (Metropolis accuracy
        # + clean warm start for the next sweep)
        M = assemble_embedding(lat, M_static, dre, dim_)
        evals_n, X_n, Y_n = diagonalize_embedding(M)

    # difference-based ΔH (conditioning: see ops/spectral.energy_difference)
    d_kin = jnp.sum(pre**2 + pim**2 - pi_re0**2 - pi_im0**2) / (2.0 * mass)
    d_bos = (beta / (2.0 * J)) * jnp.sum(
        dre**2 + dim_**2 - state.delta_re**2 - state.delta_im**2)
    half = evals_n.shape[-1] // 2
    En = jnp.abs(evals_n[half:])
    Eo = jnp.abs(state.evals[half:])
    d_fer = -(beta * jnp.sum(En - Eo)
              + 2.0 * jnp.sum(jax.nn.softplus(-beta * En)
                              - jax.nn.softplus(-beta * Eo)))
    dH = d_kin + d_bos + d_fer
    H_new = H_old + dH

    u = jax.random.uniform(k_acc, (), dtype=jnp.float32)
    accept = (dH < 0) | (u < jnp.exp(-dH.astype(jnp.float32)))

    def sel(new, old):
        return jnp.where(accept, new, old)

    new_state = HMCStateReal(
        delta_re=sel(dre, state.delta_re), delta_im=sel(dim_, state.delta_im),
        pi_re=pre, pi_im=pim, disorder=state.disorder,
        evals=sel(evals_n, state.evals), X=sel(X_n, state.X),
        Y=sel(Y_n, state.Y), key=key)
    return new_state, SweepInfo(accepted=accept, dH=dH, H_old=H_old,
                                H_new=H_new)
