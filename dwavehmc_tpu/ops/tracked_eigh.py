"""Tracked (warm-started) Hermitian eigensolver for the leapfrog hot loop.

Inside one leapfrog step H changes by O(dt), so the previous step's
eigenbasis U₀ nearly diagonalizes the new H.  Instead of a cold O((2N)³)
QDWH eigh (which runs at ~10% of the machine's matmul rate), refine U₀
with a few first-order subspace rotations — all MXU matmuls:

    T = U†HU                    (≈ diagonal)
    S_ij = T_ij/(d_j − d_i)     (anti-Hermitian, magnitude-clipped)
    U ← orthonormalize(U(I+S))  (one complex Newton–Schulz step)

Off-diagonal residuals shrink quadratically, so 2–3 iterations reach
Metropolis-grade accuracy; a final residual check falls back to the exact
embedding eigh (lax.cond) whenever level crossings stall convergence — the
solver is a *preconditioned exact* method, not an approximation: tolerance
failures always take the exact path.

Everything is complex arithmetic expressed as real (X, Y) pairs — 4 real
matmuls per complex matmul — because the target runtime executes real
dtypes only (see models/bdg_real.py).

Stability history: with S_MAX = 0.2 the simultaneous update limit-cycled
around residual ~1e-2·scale on dense spectra; S_MAX = 0.1 removes the
cycle and converges monotonically to the float32 floor (~1e-6·scale) —
measured err(Σ|E|/2) = 0 after ~20 iterations on a 288-level spectrum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

#: per-entry rotation cap (exact 2×2 Jacobi angle is ≤ π/4; damping keeps
#: the simultaneous all-pairs update contractive).  0.2 was measured to
#: limit-cycle around residual ~1e-2·scale on dense spectra; 0.1 converges
#: monotonically to the float32 floor (~1e-6·scale).
S_MAX = 0.1
#: spectral-norm cap on S.  S is anti-Hermitian, so σ(I+S) = √(1+σ(S)²);
#: Newton–Schulz converges for σ(I+S) < √3 ⟺ σ(S) < √2.  Capping σ(S) at
#: 1.0 keeps a stability margin — without it, dense spectra (mean gap ≪
#: coupling) push σ(S) past the basin, float32 blows up to NaN, and the
#: NaNs hard-crash the TPU QDWH eigh downstream.
S_SIGMA_CAP = 1.0


def _spectral_norm_est(sr, si, iters=3):
    """Power-iteration estimate of σ_max(S) (S normal ⇒ |λ| = σ)."""
    n = sr.shape[0]
    vr = jnp.full((n,), 1.0, dtype=sr.dtype) / jnp.sqrt(
        jnp.asarray(n, sr.dtype))
    vi = jnp.zeros((n,), dtype=sr.dtype)

    def mv(vr, vi):
        return sr @ vr - si @ vi, sr @ vi + si @ vr

    for _ in range(iters):
        wr, wi = mv(vr, vi)
        nrm = jnp.sqrt(jnp.sum(wr * wr + wi * wi)) + 1e-30
        vr, vi = wr / nrm, wi / nrm
    wr, wi = mv(vr, vi)
    return jnp.sqrt(jnp.sum(wr * wr + wi * wi))


def cmm(ar, ai, br, bi, precision=None):
    """(a·b) for complex a, b given as real/imag parts.

    ``precision``: jax matmul precision — on TPU the default f32 matmul
    runs at reduced (bf16-passes) precision; pass "highest" where the
    result feeds Metropolis-grade eigenvalues.

    Fast path (precision None): 3-multiplication (Karatsuba) form —
    25% fewer MXU passes at the cost of a 2×-bounded cancellation term,
    fine for the self-correcting in-trajectory refinement.  Explicit
    precision keeps the 4-mult form (no extra cancellation where the
    result feeds Metropolis energies)."""
    if precision is None:
        m1 = jnp.matmul(ar, br)
        m2 = jnp.matmul(ai, bi)
        m3 = jnp.matmul(ar + ai, br + bi)
        return m1 - m2, m3 - m1 - m2
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)  # noqa: E731
    return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)


def cmm_dag(ar, ai, br, bi, precision=None):
    """(a†·b).  Same 3-mult fast path as ``cmm``:
    m3 = (ar−ai)†(br+bi) = m1 − m2 + (ar†bi − ai†br)."""
    if precision is None:
        m1 = jnp.matmul(ar.T, br)
        m2 = jnp.matmul(ai.T, bi)
        m3 = jnp.matmul((ar - ai).T, br + bi)
        return m1 + m2, m3 - m1 + m2
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)  # noqa: E731
    return (mm(ar.T, br) + mm(ai.T, bi),
            mm(ar.T, bi) - mm(ai.T, br))


def _newton_schulz(ur, ui, precision=None):
    """One step of U ← U(3I − U†U)/2 — re-unitarizes a near-unitary U."""
    gr, gi = cmm_dag(ur, ui, ur, ui, precision)
    n = ur.shape[-1]
    mr = 1.5 * jnp.eye(n, dtype=ur.dtype) - 0.5 * gr
    mi = -0.5 * gi
    return cmm(ur, ui, mr, mi, precision)


def _project_T(hr, hi, ur, ui, precision=None):
    """T = U†HU and diagnostics: (tr, ti, d, offdiag_inf)."""
    wr, wi = cmm(hr, hi, ur, ui, precision)
    tr, ti = cmm_dag(ur, ui, wr, wi, precision)
    d = jnp.diagonal(tr)
    n = d.shape[0]
    mask = 1.0 - jnp.eye(n, dtype=tr.dtype)
    off = jnp.sqrt(tr * tr + ti * ti) * mask
    return tr, ti, d, jnp.max(off)


def rotation_matrix_parts(tr, ti, d, smax=S_MAX, use_pallas=False,
                          interpret=False):
    """The damped Jacobi rotation generator S (anti-Hermitian, (sr, si))
    from the projected matrix T = U†HU and its diagonal d.

    ``use_pallas``: route the ~8 elementwise (n, n) passes (gap, |T|,
    angle, phase, sign, mask, two products) through one fused Pallas VPU
    kernel — one HBM read of (tr, ti) and one write of (sr, si) instead
    of an intermediate per pass (ops/pallas_kernels.rotation_s_parts).
    The σ-cap that follows needs all of S, so it stays outside.
    """
    if use_pallas:
        from .pallas_kernels import rotation_s_parts

        return rotation_s_parts(tr, ti, d, smax, interpret=interpret)
    n = d.shape[0]
    gap = d[None, :] - d[:, None]
    mag = jnp.sqrt(tr * tr + ti * ti)
    theta = 0.5 * jnp.arctan2(2.0 * mag, jnp.abs(gap))   # [0, π/4]
    theta = jnp.minimum(theta, smax)

    phase_r = jnp.where(mag > 1e-30, tr / jnp.maximum(mag, 1e-30), 0.0)
    phase_i = jnp.where(mag > 1e-30, ti / jnp.maximum(mag, 1e-30), 0.0)
    sgn = jnp.sign(gap + 1e-30)
    mask = 1.0 - jnp.eye(n, dtype=tr.dtype)
    return phase_r * theta * sgn * mask, phase_i * theta * sgn * mask


def tracked_step(hr, hi, ur, ui, parity=0, precision=None, ns_steps=2,
                 rot_dtype=None, rot_scheme="ns", use_pallas_s=False):
    """One refinement iteration: rotate toward the eigenbasis.

    Rotation angles come from the exact 2×2 Jacobi formula
    θ = ½·atan2(2|T_ij|, |d_i − d_j|) ∈ [0, π/4], damped to ``S_MAX`` so
    the simultaneous (all-pairs) first-order update stays contractive even
    through near-degenerate couplings (e.g. the PH pair straddling E = 0,
    which re-crosses constantly during leapfrog).

    ``ns_steps``: Newton–Schulz re-unitarization steps after the rotation.
    S is anti-Hermitian, so (I+S)†(I+S) = I + S†S deviates from I by only
    O(σ(S)²); one step leaves O(σ⁴) error and cuts the fast-path matmul
    count per iteration from 21 to 15.  Measured on-TPU (16×16/b8/K=5):
    ns=1 in-trajectory is only 3.7% faster end-to-end (the pipeline is
    not matmul-bound at this size) while the accumulated unitarity drift
    degrades the cheap-anchor Metropolis spectrum enough to collapse
    acceptance 0.88 → 0.58 even with an ns=2 endpoint refine+polish —
    so 2 stays the default; the knob is kept for larger-L experiments.

    ``rot_dtype`` (e.g. ``jnp.bfloat16``): storage dtype for the matmul
    operands — measured in-program at (64,1152,1152), bf16 matmuls run
    1.44× faster than f32-default (89 vs 62 TF/s; the chip's achievable
    rate at this shape, not the nominal 197 peak).  The S-matrix
    elementwise math (gaps, angles, phases) is cast back to f32 — note
    this only protects the *subsequent arithmetic*: the projected
    diagonal ``d`` comes out of the bf16 ``_project_T`` matmuls, so the
    level gaps (~1e-2) are already quantized at bf16 output resolution
    (~5·2⁻⁸ ≈ 2e-2) before the cast.  The rotation targeting therefore
    runs on noisy gaps under bf16 — empirically harmless
    (cheap_anchor_validation_bf16.json: bias unchanged) because a
    mis-sized rotation only slows convergence, and the endpoint
    refine+polish always re-projects in f32.  The basis floor becomes
    the bf16 epsilon — callers that feed Metropolis must re-polish in
    f32; if exact bf16 gap resolution ever matters, compute the
    projection diagonal in f32.
    """
    del parity
    if rot_dtype is not None:
        # operands (incl. the loop carry — cast once by the caller) stay
        # in rot_dtype; only the S construction below runs in f32
        hr, hi = hr.astype(rot_dtype), hi.astype(rot_dtype)
        ur, ui = ur.astype(rot_dtype), ui.astype(rot_dtype)
    tr, ti, d, _ = _project_T(hr, hi, ur, ui, precision)
    if rot_dtype is not None:
        tr, ti = tr.astype(jnp.float32), ti.astype(jnp.float32)
        d = d.astype(jnp.float32)

    sr, si = rotation_matrix_parts(tr, ti, d, S_MAX, use_pallas=use_pallas_s)

    # stability cap: σ(S) ≤ S_SIGMA_CAP keeps Newton–Schulz in its basin
    sigma = _spectral_norm_est(sr, si)
    alpha = jnp.minimum(1.0, S_SIGMA_CAP / jnp.maximum(sigma, 1e-30))
    sr = sr * alpha
    si = si * alpha

    if rot_dtype is not None:
        sr, si = sr.astype(rot_dtype), si.astype(rot_dtype)
    if rot_scheme == "exp2":
        # second-order exponential: U ← U(I + S + S²/2).  With S
        # anti-Hermitian the Gram error is (I+S+S²/2)†(I+S+S²/2) − I =
        # S⁴/4 — two orders better than U(I+S)'s −S² — so ONE
        # Newton–Schulz step reaches ~σ⁸/16, strictly tighter than the
        # "ns" scheme's 2-step ~σ⁸ at 18 vs 21 fast-path matmuls per
        # iteration (project 6 + S² 3 + U·V 3 + NS 6).
        v2r, v2i = cmm(sr, si, sr, si, precision)
        vr = sr + 0.5 * v2r
        vi = si + 0.5 * v2i
        wr, wi = cmm(ur, ui, vr, vi, precision)
        ur, ui = ur + wr, ui + wi
    else:
        vr, vi = cmm(ur, ui, sr, si, precision)      # U S
        ur, ui = ur + vr, ui + vi
    for _ in range(ns_steps):
        ur, ui = _newton_schulz(ur, ui, precision)
    return ur, ui


def rayleigh_corrected_evals(tr, ti, d):
    """Second-order perturbative eigenvalue correction from the projected
    matrix T = U†HU (U near-eigenbasis): e_i ≈ d_i + Σ_{j≠i} |T_ij|² ·
    g_ij/(g_ij² + |T_ij|²), with g_ij = d_i − d_j.

    This is a damped (Padé) form of the Rayleigh–Schrödinger term
    |T_ij|²/g_ij: exact in the |T_ij| ≪ |g| limit and bounded at
    degeneracies, where the bare term diverges (a degenerate pair's true
    first-order split is ±|T_ij| with basis-dependent sign — contributing
    ~0 there is safe: no worse than the uncorrected readout, and the
    fermion energy depends only on |E| so near-zero PH-pair sign noise
    cancels).  Removes the leading O(res²/gap) error of the diagonal
    readout d_i = T_ii, the term that dominates the cheap-anchor dH
    error — an O(n²) elementwise pass in place of further O(n³) polish
    rotations."""
    n = d.shape[0]
    mask = 1.0 - jnp.eye(n, dtype=tr.dtype)
    m2 = (tr * tr + ti * ti) * mask
    g = d[:, None] - d[None, :]
    corr = jnp.sum(m2 * g / (g * g + m2 + 1e-30), axis=1)
    return d + corr


def _sort_by_evals(d, ur, ui):
    order = jnp.argsort(d)
    return d[order], ur[:, order], ui[:, order]


def full_eigh_from_parts(hr, hi):
    """Exact solver: real-symmetric embedding eigh of H = hr + i·hi."""
    top = jnp.concatenate([hr, -hi], axis=1)
    bot = jnp.concatenate([hi, hr], axis=1)
    M = jnp.concatenate([top, bot], axis=0)
    w, V = jnp.linalg.eigh(M)
    dim = hr.shape[0]
    return w[::2], V[:dim, ::2], V[dim:, ::2]


def tracked_eigh_nofallback(hr, hi, ur0, ui0, *, n_iter: int = 6,
                            precision=None, eval_precision=None,
                            ns_steps: int = 2, rot_dtype=None,
                            eval_correction: bool = False,
                            rot_scheme: str = "ns",
                            use_pallas_s: bool = False):
    """Refinement only — no exact-eigh fallback.  For use under vmap, where
    ``lax.cond`` degrades to select (both branches would execute for every
    batch element).  Returns (evals ascending, Ur, Ui, offdiag residual);
    callers are expected to run one exact eigh per sweep to re-anchor (see
    sampler/hmc_real.hmc_sweep_real with eigh_mode="tracked").

    ``eval_precision``: matmul precision of the FINAL eigenvalue readout
    T = U†HU only (defaults to ``precision``).  Rotation noise perturbs
    the basis, whose eigenvalue error is second order (∝ residual²/gap);
    the readout's error is first order in matmul noise — so Metropolis-
    grade energies need only the readout at "highest", letting the
    rotations run at the fast default (bf16-pass) MXU rate.

    The refinement loop is a rolled ``fori_loop`` so the compiled program
    stays small even inside a long leapfrog scan.  Eigenvalues are NOT
    sorted: every downstream use during a trajectory (Fermi factors,
    forces, masked observables) is order-independent, and the per-sweep
    exact re-anchor restores sorted order for the Metropolis energy
    difference.

    ``rot_dtype``: run the rotation matmuls with bf16 storage (see
    tracked_step) — the loop carry is cast once here, and the returned
    basis/readout are cast back to the input dtype.  The basis floor is
    then the bf16 epsilon; downstream Metropolis use requires an f32
    re-polish (callers: sampler/hmc_real.tracked_leapfrog keeps the
    endpoint refine+polish phases in f32)."""

    def body(_k, uv):
        return tracked_step(hr, hi, *uv, precision=precision,
                            ns_steps=ns_steps, rot_dtype=rot_dtype,
                            rot_scheme=rot_scheme,
                            use_pallas_s=use_pallas_s)

    cdt = ur0.dtype
    if rot_dtype is not None:
        ur0, ui0 = ur0.astype(rot_dtype), ui0.astype(rot_dtype)
    ur, ui = lax.fori_loop(0, n_iter, body, (ur0, ui0))
    if rot_dtype is not None:
        ur, ui = ur.astype(cdt), ui.astype(cdt)
    tr, ti, d, res = _project_T(hr, hi, ur, ui,
                                precision if eval_precision is None
                                else eval_precision)
    if eval_correction:
        d = rayleigh_corrected_evals(tr, ti, d)
    return d, ur, ui, res


@partial(jax.jit, static_argnames=("n_iter",))
def tracked_eigh(hr, hi, ur0, ui0, *, n_iter: int = 3, tol: float = 1e-4):
    """Eigendecomposition of H = hr + i·hi warm-started at U₀ = ur0 + i·ui0.

    Returns (evals ascending, Ur, Ui, used_fallback: bool scalar).  If the
    off-diagonal residual after ``n_iter`` refinements exceeds ``tol``
    relative to the spectral scale, the exact embedding eigh runs instead.
    """
    ur, ui = ur0, ui0
    for k in range(n_iter):
        ur, ui = tracked_step(hr, hi, ur, ui, parity=k % 2)
    _, _, d, res = _project_T(hr, hi, ur, ui)

    scale = jnp.maximum(jnp.max(jnp.abs(d)), 1e-30)
    bad = res > tol * scale

    def exact(_):
        return full_eigh_from_parts(hr, hi)

    def keep(args):
        return _sort_by_evals(*args)

    evals, Ur, Ui = lax.cond(bad, exact, keep, (d, ur, ui))
    return evals, Ur, Ui, bad
