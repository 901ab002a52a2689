"""Particle-hole–split exact eigensolver for the BdG real embedding.

XLA's TPU eigh (QDWH spectral divide-and-conquer) runs at ~0.3 TFLOP/s
effective on the embedding shapes — the dominant anchor/init cost
(reference cost center: src/Hamiltonian.jl:96-114 ``eigen!``).  This
module cuts the eigh dimension in HALF by exploiting a symmetry the
reference never uses:

The BdG Hamiltonian H = [[h, Δ], [Δ†, −h]] (h real symmetric, Δ complex
symmetric; models/bdg.py conventions from src/Hamiltonian.jl:10-86) has a
particle–hole symmetry u → (ū₂, −ū₁): if H u = E u then the mapped vector
is an eigenvector with −E.  On the real-symmetric embedding
M = [[A, −B], [B, A]] (models/bdg_real.py) that antiunitary map becomes
the LINEAR signed permutation

    S : [x₁, x₂, y₁, y₂]  →  [x₂, −x₁, −y₂, y₁]        (S Mᵀ S = −M)

verified exact at machine precision against the assembled embedding.  So
the spectrum is symmetric about 0, the positive subspace has rank exactly
dim/2 (a STATIC shape — jit-friendly), and every negative eigenvector is
S applied to a positive one, for free.  The exact diagonalization then
reduces to:

 1. ``sign(M)`` by a matmul-only polynomial iteration (MXU-resident:
    a quintic "lift" schedule that multiplies the smallest |E|/‖M‖ by
    ~3.4× per step, then cubic Newton–Schulz cleanup — all large batched
    matmuls, no data-dependent control flow),
 2. an orthonormal basis Q of the positive subspace from a fixed random
    sketch of the projector P₊ = (I + sign M)/2 (shifted CholeskyQR³;
    the sketch has a square-Gaussian core with κ ~ O(dim)),
 3. Rayleigh–Ritz: eigh of T = Qᵀ M Q at HALF the dimension (QDWH work
    scales ~dim³ ⇒ ~8× less), positive eigenvectors V₊ = Q V_T,
 4. the negative half exactly by applying S.

Accuracy (measured, 12×12 BdG instance, f32 vs f64 oracle): eigenvalues
to 6e-7 absolute (plain f32 QDWH: 2.4e-7), eigenvector residual column
norms ≤ 8e-4, orthogonality 7e-7.  Eigenvalues are Rayleigh quotients —
variationally accurate — so the Metropolis ΔH built from them carries no
first-order error; eigenvector residuals sit far below the spectral
broadening η used by every transport observable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: quintic lift coefficients: p(x) = a·x + b·x³ + c·x⁵ keeps p([0, 1.02])
#: inside [0, ~1.2] while multiplying small singular values by ~3.44 per
#: application (the widely used Newton–Schulz-quintic momentum-orthogonal-
#: ization schedule); composed n times it lifts |E|min/‖M‖ ≥ 3.44⁻ⁿ to
#: O(1), after which cubic Newton–Schulz converges quadratically to ±1.
_LIFT_ABC = (3.4445, -4.7750, 2.0315)

#: interval-minimax quintic schedule for |E|min/‖M‖ ≥ 1e-5: step k is the
#: Remez-optimal odd quintic on the image interval of step k−1, each
#: optimized on [l, 1.05·u] — the 5% overshoot margin is what keeps the
#: composition inside the contraction basin under NOISY matmuls: the
#: spectral perturbation from entrywise matmul roundoff scales like
#: √dim·ε_elem, which at dim 4608 with bf16×3-pass ("HIGH") arithmetic
#: reaches the percent range (an earlier 8-step/1.02-margin/1e-4-floor
#: schedule NaN'd stochastically at (64,2304,2304) on hardware via
#: exactly this mechanism; eigenvalues pushed past the basin edge
#: diverge under composition).  10 steps map [1e-5, 1] → [1∓6e-5], and a
#: worst-case composition with 2%-per-step multiplicative noise stays
#: within 0.021 of ±1 (Newton–Schulz cleanup contracts anything < 0.3).
#: Regenerate with a different floor via the Remez snippet in
#: docs/design.md if production spectra ever close below 1e-5·‖M‖.
_MINIMAX_1E5 = (
    (8.108458, -21.837891, 14.703751),
    (4.053782, -2.729520, 0.459486),
    (4.051804, -2.728312, 0.459370),
    (4.043810, -2.723430, 0.458899),
    (4.011801, -2.703853, 0.457013),
    (3.888355, -2.627951, 0.449713),
    (3.475152, -2.368622, 0.424954),
    (2.595839, -1.776606, 0.370504),
    (1.923282, -1.243587, 0.330214),
    (1.830378, -1.161187, 0.330860),
)

#: shallower schedules for better-conditioned spectra (same Remez
#: construction, 1.05 margin; worst |x−1| under 2%-per-step multiplicative
#: noise: 0.033 (1e-3) / 0.024 (1e-4) — inside the Newton–Schulz basin).
#: Floor 1e-3 cuts the lift matmuls 40% vs the 1e-5 table; callers must
#: KNOW the spectral floor (e.g. |E|min/‖M‖ of the carried tracked
#: spectrum) — a spectrum below the floor diverges under composition.
_MINIMAX_1E3 = (
    (8.068965, -21.696409, 14.601655),
    (3.990873, -2.691030, 0.455779),
    (3.811545, -2.580386, 0.445149),
    (3.260846, -2.230295, 0.411904),
    (2.331140, -1.580238, 0.353808),
    (1.861979, -1.187915, 0.328541),
)

_MINIMAX_1E4 = (
    (8.104853, -21.824973, 14.694429),
    (4.047961, -2.725965, 0.459144),
    (4.028361, -2.713987, 0.457990),
    (3.951296, -2.666732, 0.453441),
    (3.674171, -2.494620, 0.436943),
    (2.942654, -2.018669, 0.392256),
    (2.077411, -1.377361, 0.338267),
    (1.835356, -1.164485, 0.329544),
)

_MINIMAX_BY_FLOOR = {1e-3: _MINIMAX_1E3, 1e-4: _MINIMAX_1E4,
                     1e-5: _MINIMAX_1E5}


def minimax_schedule(floor: float):
    """The shallowest embedded minimax schedule valid for a given
    spectral floor |E|min/‖M‖ (≥ the requested floor)."""
    for f in sorted(_MINIMAX_BY_FLOOR, reverse=True):
        if floor >= f:
            return _MINIMAX_BY_FLOOR[f]
    raise ValueError(
        f"no embedded schedule for spectral floor {floor:g} (< 1e-5); "
        "regenerate via the Remez snippet in docs/design.md")


def ph_reflect(V):
    """Apply the PH map S to eigenvector columns: (4N, k) → (4N, k).

    Row blocks [x₁, x₂, y₁, y₂] (each N) → [x₂, −x₁, −y₂, y₁]; maps an
    E-eigenvector of the embedding to a (−E)-eigenvector exactly.
    """
    n4 = V.shape[-2]
    N = n4 // 4
    x1, x2, y1, y2 = (V[..., i * N:(i + 1) * N, :] for i in range(4))
    return jnp.concatenate([x2, -x1, -y2, y1], axis=-2)


def _matmul(a, b, precision=None):
    return jnp.matmul(a, b, precision=precision or jax.lax.Precision.HIGHEST)


def sign_embedding(M, n_lift: int | None = None, n_ns: int = 3,
                   lift_precision=jax.lax.Precision.HIGHEST,
                   floor: float = 1e-5, return_resid: bool = False):
    """Matrix sign function of a symmetric M with spectrum bounded away
    from 0, via scaled polynomial iteration (matmuls only).

    ``n_lift=None`` (default) uses the interval-minimax schedule for the
    stated spectral ``floor`` (|E|min/‖M‖ ≥ floor; embedded tables at
    1e-3 / 1e-4 / 1e-5 — the 1e-3 one has 40% fewer lift matmuls); an
    integer selects n fixed-coefficient lift steps instead (handles
    |E|min/‖M‖ down to ~3.44^−n — the slower, arbitrarily-deep
    fallback).  ``n_ns`` Newton–Schulz steps contract the residual
    quadratically to the f32 floor.  ``lift_precision`` applies to the
    lift phase only (HIGH = 3-pass bf16 is ~2× the HIGHEST MXU rate;
    cleanup always runs HIGHEST so the converged sign — and hence the
    subspace split — reaches the f32 floor).
    """
    # guaranteed spectral bound: ‖M‖₂ ≤ ‖M‖∞ (row-sum); an underestimate
    # would let the quintic diverge, so a cheap exact bound beats a tight
    # power-iteration estimate here
    lam = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)[..., None, None]
    X = M / lam
    sched = (minimax_schedule(floor) if n_lift is None
             else (_LIFT_ABC,) * n_lift)
    for a, b, c in sched:
        X2 = _matmul(X, X, lift_precision)
        X = a * X + _matmul(X2, b * X + c * _matmul(X2, X, lift_precision),
                            lift_precision)
    X2 = None
    for _ in range(n_ns):
        X2 = _matmul(X, X)
        X = 1.5 * X - 0.5 * _matmul(X2, X)
    if return_resid and X2 is None:          # n_ns == 0
        X2 = _matmul(X, X)
    if return_resid:
        # ‖X²−I‖max of the LAST pre-update iterate — free (X2 already
        # computed).  A converged sign has X² = I to the f32 floor; an
        # eigenvalue below the schedule's spectral floor maps to
        # s ∈ (−1, 1) and leaves |s²−1| = O(1), so this residual detects
        # the silent-divergence mode the floor guard exists for.  The
        # final NS update shrinks the true residual ~quadratically below
        # this, so thresholding the pre-update value is conservative.
        resid = jnp.max(jnp.abs(
            X2 - jnp.eye(X.shape[-1], dtype=X.dtype)), axis=(-2, -1))
        return X, resid
    return X


@functools.lru_cache(maxsize=8)
def _sketch(dim: int, dtype_name: str) -> np.ndarray:
    """Fixed random (dim, dim/2) sketch — deterministic, shared across the
    batch, reproducible across processes."""
    rng = np.random.default_rng(0x9E3779B9 ^ dim)
    return rng.standard_normal((dim, dim // 2)).astype(dtype_name)


def cholqr2(Y, shift_first: bool = True):
    """Shifted CholeskyQR³ orthonormalization (matmul + cholesky +
    triangular solve — all batched TPU-native).

    The projector sketch has a square-Gaussian core, so κ(Y) ~ O(dim)
    with a heavy 1/σmin tail (measured κ ≈ 450 at dim 1024); plain
    CholeskyQR² fails stochastically above κ ≈ 1/∜eps.  The first pass
    therefore shifts the Gram matrix (Fukaya et al. shifted-CholQR:
    guarantees the factorization and bounds the intermediate κ), and two
    unshifted passes restore orthogonality to the f32 floor for any
    κ(Y) ≲ 1e5."""
    from jax.lax.linalg import triangular_solve

    n = Y.shape[-2]
    passes = 3 if shift_first else 2
    for i in range(passes):
        G = _matmul(jnp.swapaxes(Y, -1, -2), Y)
        if shift_first and i == 0:
            eps = jnp.finfo(Y.dtype).eps
            s = 11.0 * n * eps * jnp.max(
                jnp.sum(jnp.abs(G), axis=-1), axis=-1)[..., None]
            G = G + s[..., None] * jnp.eye(G.shape[-1], dtype=G.dtype)
        L = jnp.linalg.cholesky(G)
        # Y ← Y L⁻ᵀ  (right-solve against lower-triangular Lᵀ)
        Y = triangular_solve(L, Y, left_side=False, lower=True,
                             transpose_a=True)
    return Y


def orth_ns(Y, n_lift: int = 8, n_ns: int = 4):
    """Matmul-only orthonormalization fallback (rectangular quintic +
    Newton–Schulz polar iteration) for runtimes without
    cholesky/triangular_solve.  Handles κ(Y) up to ~3.44^n_lift
    (n_lift=8 → 2e4; the projector sketch measures κ ≈ 450 with a heavy
    tail, see cholqr2)."""
    g = jnp.max(jnp.sum(jnp.abs(_matmul(jnp.swapaxes(Y, -1, -2), Y)),
                        axis=-1), axis=-1)[..., None, None]
    X = Y / jnp.sqrt(g)
    a, b, c = _LIFT_ABC
    for _ in range(n_lift):
        G = _matmul(jnp.swapaxes(X, -1, -2), X)
        X = a * X + _matmul(X, b * G + c * _matmul(G, G))
    for _ in range(n_ns):
        G = _matmul(jnp.swapaxes(X, -1, -2), X)
        X = 1.5 * X - 0.5 * _matmul(X, G)
    return X


def positive_basis(M, sgn, orth: str = "chol"):
    """Orthonormal basis (…, 4N, 2N) of the positive-energy subspace from
    the (approximate) sign matrix."""
    dim = M.shape[-1]
    G = jnp.asarray(_sketch(dim, str(M.dtype)))
    Y = 0.5 * (_matmul(sgn, G) + G)
    return cholqr2(Y) if orth == "chol" else orth_ns(Y)


#: guard thresholds for the default-safe PH path.  RESID: a converged
#: sign matrix has ‖X²−I‖max at the f32 floor (measured ~1e-5 at dim
#: 2304); any eigenvalue left unconverged by a spectrum below the
#: schedule floor gives O(1).  RATIO: the smallest Rayleigh–Ritz
#: eigenvalue over the ‖M‖∞ bound must clear the schedule floor with a
#: 2× margin — a true eigenvalue just below 1e-5·‖M‖ partially converges
#: and still surfaces as a small Ritz value.
PH_GUARD_RESID = 0.05
PH_GUARD_RATIO = 2e-5


def diagonalize_embedding_ph_guarded(M, *, floor: float = 1e-5,
                                     lift_precision=jax.lax.Precision.HIGHEST,
                                     orth: str = "chol"):
    """Default-safe PH-split diagonalization with a runtime floor guard.

    Computes the PH-split solution WITH convergence diagnostics, then
    falls back to the full QDWH embedding eigh via a single batch-level
    ``lax.cond`` whenever (a) the sign iteration failed to converge
    (‖sgn²−I‖max > PH_GUARD_RESID — the signature of a spectrum below the
    minimax schedule's floor, the PH solver's silent-divergence mode) or
    (b) the smallest Ritz value sits under ``PH_GUARD_RATIO``·‖M‖∞.

    MUST be called OUTSIDE any vmap: under vmap ``lax.cond`` lowers to
    ``select`` and both solvers would run for every element, erasing the
    PH speedup.  ``M`` may carry leading batch dims — the guard is a
    single scalar over the whole batch (one bad chain re-solves the
    batch exactly; correctness first, and the bad case is rare).

    Returns ``(evals, X, Y, used_fallback)``.
    """
    from ..models.bdg_real import diagonalize_embedding

    dim = M.shape[-1]
    half = dim // 2
    Mg = jnp.where(jnp.isfinite(M), M, jnp.zeros_like(M))
    sgn, resid = sign_embedding(Mg, lift_precision=lift_precision,
                                floor=floor, return_resid=True)
    Q = positive_basis(Mg, sgn, orth=orth)
    MQ = _matmul(Mg, Q)
    T = _matmul(jnp.swapaxes(Q, -1, -2), MQ)
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    T = jnp.where(jnp.isfinite(T), T, jnp.zeros_like(T))
    wt, Vt = jnp.linalg.eigh(T)
    Vp = _matmul(Q, Vt)

    lam = jnp.max(jnp.sum(jnp.abs(Mg), axis=-1), axis=-1)
    min_ratio = jnp.min(jnp.abs(wt), axis=-1) / jnp.maximum(lam, 1e-30)
    ok = (jnp.all(resid < PH_GUARD_RESID)
          & jnp.all(min_ratio > PH_GUARD_RATIO)
          & jnp.all(jnp.isfinite(wt)))

    def from_ph(_):
        wp = wt[..., ::2]
        Vp1 = Vp[..., :, ::2]
        Vn1 = ph_reflect(Vp1)[..., :, ::-1]
        evals = jnp.concatenate([-wp[..., ::-1], wp], axis=-1)
        V = jnp.concatenate([Vn1, Vp1], axis=-1)
        return evals, V[..., :half, :], V[..., half:, :]

    def from_qdwh(_):
        return diagonalize_embedding(Mg)

    evals, X, Y = jax.lax.cond(ok, from_ph, from_qdwh, None)
    return evals, X, Y, ~ok


def diagonalize_embedding_ph(M, n_lift: int | None = None, n_ns: int = 3,
                             orth: str = "chol",
                             lift_precision=jax.lax.Precision.HIGHEST,
                             floor: float = 1e-5):
    """Drop-in replacement for models/bdg_real.diagonalize_embedding:
    (evals (2N,), X (2N, 2N), Y (2N, 2N)) — one eigenpair per doubled
    level, ascending, complex eigenvectors U = X + iY.

    The half-dim eigh input is NaN-guarded (the TPU QDWH eigh
    hard-crashes the worker on non-finite input — same contract as
    sampler/hmc_real._finite_or_zero).
    """
    dim = M.shape[-1]          # 4N
    half = dim // 2            # 2N
    sgn = sign_embedding(M, n_lift=n_lift, n_ns=n_ns,
                         lift_precision=lift_precision, floor=floor)
    Q = positive_basis(M, sgn, orth=orth)
    MQ = _matmul(M, Q)
    T = _matmul(jnp.swapaxes(Q, -1, -2), MQ)
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    T = jnp.where(jnp.isfinite(T), T, jnp.zeros_like(T))
    wt, Vt = jnp.linalg.eigh(T)            # (…, 2N) ascending, positive
    Vp = _matmul(Q, Vt)                    # (…, 4N, 2N)

    # one representative per doubled level (same convention as
    # diagonalize_embedding: adjacent pairs are the embedding doubling)
    wp = wt[..., ::2]                      # (…, N) ascending
    Vp1 = Vp[..., :, ::2]                  # (…, 4N, N)
    Vn1 = ph_reflect(Vp1)[..., :, ::-1]    # (−E)-vectors, ascending order
    evals = jnp.concatenate([-wp[..., ::-1], wp], axis=-1)      # (…, 2N)
    V = jnp.concatenate([Vn1, Vp1], axis=-1)                    # (…, 4N, 2N)
    X = V[..., :half, :]
    Y = V[..., half:, :]
    return evals, X, Y
