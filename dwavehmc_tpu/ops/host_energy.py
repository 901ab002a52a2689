"""Host-side f64 HMC energy readout — exact Metropolis beyond the f32 wall.

The TPU backend runs no float64, which caps the accuracy of the on-device
ΔH at roughly the f32 eigenvalue floor: storing/solving E to ~2e-7·‖M‖
turns into a Metropolis dH error of order β·√(2N)·2e-7·‖M‖ — past β ≈ 3e3
that noise is O(1) and acceptance collapses no matter how small dt gets
(measured: acc 0.39 at β=1e4 and 0.20 at β=1e5 on a 12×12 clean lattice
with exact per-sweep anchors; the dt controller hit its floor with no
improvement, the signature of noise rather than integration error).  The
reference's β grid tops out at 1e5 (scripts/batch_scan_beta.jl:22-25) and
its T grid reaches T=1e-4 (scripts/batch_scan_T.jl:10-27), both deep
inside that regime — the reference pays for it with ComplexF64 LAPACK.

The TPU-native answer keeps the trajectory (forces, leapfrog, eigenbasis
tracking) on-device in f32 — any proposal distribution is valid for HMC —
and moves only the once-per-sweep Metropolis ENERGY readout to the host:

 * the endpoint (Δ, π) pairs are tiny ((N,2) each — ~0.3 MB/sweep for a
   72-chain 12×12 ensemble) so the device→host transfer is noise,
 * the host assembles the COMPLEX 2N×2N BdG matrix in complex128 (no
   complex/f64 restriction off-device) and takes `eigvalsh` — a few ms at
   the reference's 12×12 β-scan shape,
 * H is evaluated in f64: the sampled distribution becomes exp(−H_f64(Δ))
   EXACTLY (Δ lives on the f32-representable grid, which is merely the
   state-space discretization).

What this buys (measured, 12×12 clean lattice on hardware): the accept
DECISIONS become exact — the β·√(2N)·2e-7·‖M‖ eigenvalue-noise term is
gone from dH.  What remains is the real f32 TRAJECTORY error (|dH| ≈ 1
at β=1e4 under the r3 cold-start protocol, examples/
beta_extreme_validation.json), so window acceptance at extreme β also
needs adequate thermalization/annealing and enough leapfrog resolution —
see drivers/scan.py's β-ladder warm-start and docs/validation.md.

Measured on CPU (12×12 instance): the f64 Rayleigh/eigh readout reproduces
Σ_{E>0}E to 2e-13 absolute vs 2.4e-6 for f32 eigenvalues — i.e. dH error
≲1e-8·β instead of ~1e-4·√(2N)·β.

Conventions mirror sampler/hmc_real exactly (reference src/HMC.jl:12-41):
kinetic Σ|π|²/2m, boson β/(2J)Σ|Δ|², fermion −Σ_{E>0}(βE + 2·log1pexp(−βE))
evaluated in the PH-even all-levels/2 form.
"""

from __future__ import annotations

import functools

import numpy as np

from ..models.bdg import adjacency, pairing_scatter_indices
from ..models.lattice import LatticeSpec


@functools.lru_cache(maxsize=None)
def _adjacency_f64(lat: LatticeSpec):
    A_nn, A_nnn = adjacency(lat)
    return (np.asarray(A_nn, np.float64), np.asarray(A_nnn, np.float64))


def complex_bdg_np(lat: LatticeSpec, t: float, tp: float, mu: float,
                   disorder, delta_re, delta_im) -> np.ndarray:
    """The 2N×2N complex-Hermitian BdG matrix in complex128.

    Same matrix the device paths assemble (models/bdg.py /
    models/bdg_real.assemble_parts; reference src/Hamiltonian.jl:10-86):
    H = [[h, TR], [TR†, −h]] with h = −t·A_nn − tp·A_nnn + diag(w−μ) and
    TR the complex-symmetric Δ/2 pairing scatter.
    """
    N = lat.n_sites
    A_nn, A_nnn = _adjacency_f64(lat)
    h = (-float(t)) * A_nn + (-float(tp)) * A_nnn
    h = h + np.diag(np.asarray(disorder, np.float64) - float(mu))

    rows, cols = pairing_scatter_indices(lat)
    half = 0.5 * (np.asarray(delta_re, np.float64)
                  + 1j * np.asarray(delta_im, np.float64))
    vals = np.concatenate([half[:, 0], half[:, 0], half[:, 1], half[:, 1]])
    TR = np.zeros((N, N), np.complex128)
    np.add.at(TR, (rows, cols), vals)

    H = np.zeros((2 * N, 2 * N), np.complex128)
    H[:N, :N] = h
    H[N:, N:] = -h
    H[:N, N:] = TR
    H[N:, :N] = TR.conj().T
    return H


def _softplus(x):
    """log(1+exp(x)) for x ≤ 0 — stable, underflows cleanly to 0."""
    return np.log1p(np.exp(x))


def fermion_energy_np(evals, beta: float) -> float:
    """−Σ_{E>0}(βE + 2·log1pexp(−βE)) via the PH-even all-levels/2 form
    (identical under ±E pairing; sampler/hmc_real._energy_terms)."""
    x = float(beta) * np.abs(np.asarray(evals, np.float64))
    return float(-0.5 * np.sum(x + 2.0 * _softplus(-x)))


def potential_energy_np(lat: LatticeSpec, t, tp, mu, beta, J,
                        disorder, delta_re, delta_im) -> float:
    """Boson + fermion potential of one chain's Δ, in f64.

    Returns +inf for non-finite Δ (the caller rejects such proposals, and
    the host eigvalsh must never see NaNs — mirroring the device-side
    _finite_or_zero contract)."""
    dre = np.asarray(delta_re, np.float64)
    dim_ = np.asarray(delta_im, np.float64)
    if not (np.isfinite(dre).all() and np.isfinite(dim_).all()):
        return float("inf")
    bos = (float(beta) / (2.0 * float(J))) * float(np.sum(dre**2 + dim_**2))
    H = complex_bdg_np(lat, t, tp, mu, disorder, dre, dim_)
    evals = np.linalg.eigvalsh(H)
    return bos + fermion_energy_np(evals, beta)


def kinetic_energy_np(pi_re, pi_im, mass) -> np.ndarray:
    """Σ|π|²/2m per chain: inputs (B, N, 2) → (B,) f64 (inf if non-finite)."""
    pr = np.asarray(pi_re, np.float64)
    pi_ = np.asarray(pi_im, np.float64)
    kin = np.sum(pr**2 + pi_**2, axis=(-2, -1)) / (2.0 * np.asarray(
        mass, np.float64))
    bad = ~(np.isfinite(pr).all(axis=(-2, -1))
            & np.isfinite(pi_).all(axis=(-2, -1)))
    return np.where(bad, np.inf, kin)


def _per_chain(x, b: int, i: int) -> float:
    """Pick chain i from a possibly per-chain (length-b) parameter leaf.

    A leaf that is neither scalar nor length-b means the caller subset the
    states without subsetting params (or vice versa) — silently handing
    every chain element 0's β would corrupt the exact readout, so fail
    loudly instead (ADVICE r3)."""
    a = np.asarray(x, np.float64).reshape(-1)
    if a.size not in (1, b):
        raise ValueError(
            f"per-chain params leaf has size {a.size}, but the state batch "
            f"is {b}: params and states were subset inconsistently")
    return float(a[i]) if a.size == b else float(a[0])


def potential_batch_np(lat: LatticeSpec, params, disorder,
                       delta_re, delta_im, *, params_axis=None) -> np.ndarray:
    """(B,) f64 potential energies.  ``params`` is a ModelParams whose
    leaves are scalars, or per-chain arrays when ``params_axis == 0``
    (the vectorized scan's β/T grid)."""
    dre = np.asarray(delta_re)
    b = dre.shape[0]
    dis = np.asarray(disorder)
    out = np.empty(b, np.float64)
    for i in range(b):
        if params_axis == 0:
            t, tp, mu = (_per_chain(params.t, b, i),
                         _per_chain(params.tp, b, i),
                         _per_chain(params.mu, b, i))
            beta, J = _per_chain(params.beta, b, i), _per_chain(params.J, b, i)
        else:
            t, tp, mu = float(params.t), float(params.tp), float(params.mu)
            beta, J = float(params.beta), float(params.J)
        out[i] = potential_energy_np(lat, t, tp, mu, beta, J,
                                     dis[i], dre[i],
                                     np.asarray(delta_im)[i])
    return out


def mass_array_np(params, b: int, *, params_axis=None) -> np.ndarray:
    if params_axis == 0:
        return np.asarray([_per_chain(params.mass, b, i) for i in range(b)])
    return np.full(b, float(params.mass))
