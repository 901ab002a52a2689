"""Transport & spectral measurements: stiffness, σ(ω), DOS, A(k,0).

Rebuild of build_current_operator! + measure_transport_and_spectra
(src/Observables.jl:237-526), restructured for the MXU/VPU:

 * current matrix elements J_mn = U†(Jx U) as two dense matmuls (the
   reference uses sparse×dense + zgemm; at 2N ≤ 2048 dense block matmuls
   are faster on the MXU and need no sparse runtime),
 * the σ(ω)/DC double loop over (n, m) — ~1.9e9 Lorentzian evaluations at
   24×24 defaults — becomes a chunked broadcast contraction
   Σ_nm W[n,m]·L(ω − ΔE[n,m]) with `lax.map` over ω-chunks to bound
   memory at (chunk × (2N)²),
 * DOS / antinodal DOS are matmuls against phase vectors + a (2N × n_ω)
   broadcast,
 * A(k, ω=0) runs `jnp.fft.fft2` over all eigenstates at once, replacing
   the reference's data-dependent per-state `if` (src/Observables.jl:495)
   with a weight mask — trace-safe and batched.

Everything here is pure and vmap-able over a leading ensemble axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .lattice import LatticeSpec, antinodal_phases, neighbor_tables
from .params import HMCState, ModelParams, SpectralSpec
from ..ops.spectral import fermi_factors

#: pairs with |E_m − E_n| below this use the degenerate limit β·f·(1−f)
#: (src/Observables.jl:374-378)
DEGENERATE_EPS = 1e-8


class SpectrumResult(NamedTuple):
    """Heavy-measurement outputs (src/Observables.jl:293-308)."""

    superfluid_stiffness: jax.Array   # ρ_s = ⟨−Kx⟩ − Λ_xx
    dc_conductivity: jax.Array
    optical_conductivity: jax.Array   # Re σ(ω) on spec.omega_grid()
    dos: jax.Array                    # N(ω) on spec.dos_grid()
    dos_AN: jax.Array                 # antinodal-projected DOS
    A_k0: jax.Array                   # (Lx, Ly) Fermi-surface map


@functools.lru_cache(maxsize=None)
def current_patterns(lat: LatticeSpec) -> tuple[np.ndarray, np.ndarray]:
    """Antisymmetric ±1 bond patterns for the x-current operator.

    Jx_particle = i·t·B_nn + i·t'·(B_+x+y + B_+x−y) with
    B[i, j] = +1, B[j, i] = −1 per directed bond
    (src/Observables.jl:246-274).  Dense (N, N) numpy constants.
    """
    nn, nnn = neighbor_tables(lat)
    N = lat.n_sites
    i = np.arange(N)

    def anti(jmap):
        B = np.zeros((N, N), dtype=np.float64)
        np.add.at(B, (i, jmap), 1.0)
        np.add.at(B, (jmap, i), -1.0)
        return B

    return anti(nn[:, 0]), anti(nnn[:, 0]) + anti(nnn[:, 3])


def current_operator_particle(lat: LatticeSpec, t, tp) -> jnp.ndarray:
    """N×N particle block of Jx (the Nambu operator is blockdiag of two
    copies, src/Observables.jl:276-280)."""
    B_nn, B_nnn = current_patterns(lat)
    return 1j * (t * B_nn + tp * B_nnn)


def current_matrix_elements(lat: LatticeSpec, evecs, t, tp) -> jnp.ndarray:
    """J_mn = U† (Jx U): block-diagonal structure ⇒ two (N,N)@(N,2N)
    matmuls + one (2N,2N)@(2N,2N) — all MXU (src/Observables.jl:334-335)."""
    N = lat.n_sites
    Jp = current_operator_particle(lat, t, tp).astype(evecs.dtype)
    JU = jnp.concatenate([Jp @ evecs[:N], Jp @ evecs[N:]], axis=0)
    return evecs.conj().T @ JU


def lorentzian(x, eta):
    """(1/π)·η/(x²+η²)  (src/Observables.jl:401-403)."""
    return (eta / jnp.pi) / (x * x + eta * eta)


def diamagnetic_term(lat: LatticeSpec, evals, evecs, t, tp, beta):
    """⟨−Kx⟩ = Σ_{E>0} w_n tanh(βE/2)/N with eigenvector-weighted NN/NNN
    x-bond sums (src/Observables.jl:344-362)."""
    N = lat.n_sites
    nn, nnn = neighbor_tables(lat)
    Ut, Ub = evecs[:N], evecs[N:]

    def bond_weight(jmap):
        a = jnp.einsum("in,in->n", Ub, Ub[jmap].conj())
        b = jnp.einsum("in,in->n", Ut.conj(), Ut[jmap])
        return 2.0 * (a - b).real

    w = (t * bond_weight(nn[:, 0])
         + tp * bond_weight(nnn[:, 0])
         + tp * bond_weight(nnn[:, 3]))
    return jnp.sum(jnp.where(evals > 0,
                             w * jnp.tanh(0.5 * beta * evals), 0.0)) / N


def paramagnetic_term(evals, f, J2, beta, n_sites):
    """Λ_xx = (1/N) Σ_nm ratio(n,m)·|J_nm|², ratio = (f_n−f_m)/(E_m−E_n)
    with the degenerate limit β·f·(1−f) (src/Observables.jl:368-385)."""
    dE = evals[None, :] - evals[:, None]       # E_m − E_n
    df = f[:, None] - f[None, :]               # f_n − f_m
    small = jnp.abs(dE) < DEGENERATE_EPS
    degenerate = jnp.broadcast_to((beta * f * (1.0 - f))[:, None], dE.shape)
    ratio = jnp.where(small, degenerate, df / jnp.where(small, 1.0, dE))
    return jnp.sum(ratio * J2) / n_sites


def dc_conductivity(evals, f, J2, beta, eta, n_sites, use_pallas=False):
    """σ_DC = (π/N) Σ_nm β f_n(1−f_n)·|J_nm|²·L(E_m−E_n; η)
    (src/Observables.jl:405-424)."""
    if use_pallas:
        from ..ops.pallas_kernels import weighted_lorentzian_sum
        dE = (evals[None, :] - evals[:, None]).reshape(-1)
        w = jnp.broadcast_to((beta * f * (1.0 - f))[:, None], J2.shape)
        s = weighted_lorentzian_sum(jnp.zeros((1,), evals.dtype), -dE,
                                    (w * J2).reshape(-1), eta)
        return (jnp.pi / n_sites) * s[0].astype(evals.dtype)
    dE = evals[None, :] - evals[:, None]
    w = (beta * f * (1.0 - f))[:, None]
    return (jnp.pi / n_sites) * jnp.sum(w * J2 * lorentzian(dE, eta))


def optical_conductivity(omega_grid, evals, f, J2, eta, n_sites, chunk=16,
                         use_pallas=False):
    """Re σ(ω) = (π/N) Σ_nm (f_n−f_m)/ω·|J_nm|²·L(ω−ΔE; η) on the positive
    grid (src/Observables.jl:396-425).  The reference's triple loop is
    ~(2N)²·n_ω ≈ 1.9e9 Lorentzian evaluations at production size; here it
    is either a Pallas VPU kernel (TPU hot path) or an ω-chunked lax.map
    whose peak live broadcast is (chunk, (2N)²).
    """
    dE = (evals[None, :] - evals[:, None]).reshape(-1)
    W2 = ((f[:, None] - f[None, :]) * J2).reshape(-1)

    if use_pallas:
        from ..ops.pallas_kernels import weighted_lorentzian_sum
        s = weighted_lorentzian_sum(omega_grid, dE, W2, eta)
        return (jnp.pi / n_sites) * (s.astype(evals.dtype) / omega_grid)

    n_w = omega_grid.shape[0]
    n_pad = (-n_w) % chunk
    om = jnp.concatenate([omega_grid, jnp.full((n_pad,), 1.0, omega_grid.dtype)])
    om_chunks = om.reshape(-1, chunk)

    def per_chunk(om_c):
        L = lorentzian(om_c[:, None] - dE[None, :], eta)
        return (L @ W2) / om_c

    sig = lax.map(per_chunk, om_chunks).reshape(-1)[:n_w]
    return (jnp.pi / n_sites) * sig


def f_sum_check(omega_grid, sigma, evals, f, J2, n_sites):
    """Regular-part f-sum rule: ∫_{−∞}^{∞} Re σ_reg(ω) dω = π·Λ_xx^offdiag.

    The cheapest independent check of the Lorentzian normalization and
    ω-grid conventions (SURVEY §7 step 8; the reference's analogue is the
    dual-formula stiffness verification, scripts/debug_transport.jl:50-95):
    integrating the measured σ(ω) grid (σ is even in ω under PH symmetry,
    so 2·∫_0^∞) must recover π times the non-degenerate part of the
    paramagnetic term — the same |J_nm|² matrix elements contracted with
    (f_n−f_m)/ΔE instead of the broadened (f_n−f_m)/ω·L(ω−ΔE).  Together
    with the Drude weight π·ρ_s this completes the full sum π·⟨−Kx⟩.

    Exact only in the η → 0, ω_max → ∞, Δω → 0 limit: finite η leaks
    Lorentzian mass below the grid start (ω < η) and beyond ω_max, and
    bends 1/ω away from 1/ΔE for transitions within ~η of zero — callers
    pick grids where those are percent-level (see tests/test_transport.py).

    Returns ``(s_grid, s_pred, rel_err)`` — trapezoid integral doubled,
    π·Λ_xx^offdiag, and their relative difference.
    """
    s_grid = 2.0 * jnp.trapezoid(sigma, omega_grid)
    dE = evals[None, :] - evals[:, None]
    df = f[:, None] - f[None, :]
    small = jnp.abs(dE) < DEGENERATE_EPS
    ratio = jnp.where(small, 0.0, df / jnp.where(small, 1.0, dE))
    s_pred = jnp.pi * jnp.sum(ratio * J2) / n_sites
    rel = jnp.abs(s_grid - s_pred) / jnp.maximum(jnp.abs(s_pred), 1e-30)
    return s_grid, s_pred, rel


def density_of_states(lat: LatticeSpec, dos_grid, evals, evecs, eta):
    """N(ω) = (1/N) Σ_n w_n·L(ω−E_n), w_n = Σ_i |u_{i,n}|²
    (src/Observables.jl:440-455,517)."""
    N = lat.n_sites
    w = jnp.sum(jnp.abs(evecs[:N]) ** 2, axis=0)        # (2N,)
    L = lorentzian(dos_grid[:, None] - evals[None, :], eta)
    return (L @ w) / N


def antinodal_dos(lat: LatticeSpec, dos_grid, evals, evecs, eta):
    """DOS projected on k=(π,0),(0,π): weight = ½(|Σ_i(−1)^x u|² +
    |Σ_i(−1)^y u|²)/N per eigenstate (src/Observables.jl:458-488)."""
    N = lat.n_sites
    p1, p2 = antinodal_phases(lat)
    Ut = evecs[:N]
    s1 = jnp.asarray(p1) @ Ut                            # (2N,)
    s2 = jnp.asarray(p2) @ Ut
    w = 0.5 * (jnp.abs(s1) ** 2 + jnp.abs(s2) ** 2) / N
    L = lorentzian(dos_grid[:, None] - evals[None, :], eta)
    return L @ w


def fermi_surface_map(lat: LatticeSpec, evals, evecs, eta,
                      weight_cutoff=1e-6):
    """A(k, ω=0): Σ_n |FFT₂(u_n)|²·L(−E_n)/N with the reference's
    near-zero-energy cutoff as a mask (src/Observables.jl:493-518).
    Returns (Lx, Ly) indexed [kx, ky] like the reference's ak_map.
    """
    N = lat.n_sites
    wz = lorentzian(-evals, eta)
    w = jnp.where(wz > weight_cutoff, wz, 0.0)           # (2N,)
    # site i = y*Lx + x ⇒ reshape to [y, x]; fft2 gives [ky, kx]
    u = evecs[:N].T.reshape(-1, lat.Ly, lat.Lx)          # (2N, Ly, Lx)
    F2 = jnp.abs(jnp.fft.fft2(u, axes=(-2, -1))) ** 2
    ak_yx = jnp.einsum("n,nyx->yx", w, F2) / N
    return ak_yx.T                                        # (Lx, Ly) = [kx, ky]


def measure_transport_and_spectra(lat: LatticeSpec, spec: SpectralSpec,
                                  params: ModelParams,
                                  state: HMCState,
                                  use_pallas: bool | None = None
                                  ) -> SpectrumResult:
    """Full heavy-measurement pass given current eigenpairs
    (src/Observables.jl:314-526).

    ``use_pallas``: route the σ(ω)/DC Lorentzian contraction through the
    Pallas VPU kernel; default (None) auto-enables on TPU.
    """
    if use_pallas is None:
        from ..ops.pallas_kernels import pallas_default
        use_pallas = pallas_default()
    N = lat.n_sites
    beta, t, tp = params.beta, params.t, params.tp
    evals, evecs = state.evals, state.evecs
    rdt = evals.dtype

    f = fermi_factors(evals, beta)
    J_mn = current_matrix_elements(lat, evecs, t, tp)
    J2 = jnp.abs(J_mn) ** 2

    dia = diamagnetic_term(lat, evals, evecs, t, tp, beta)
    lam = paramagnetic_term(evals, f, J2, beta, N)
    stiffness = dia - lam

    eta = jnp.asarray(spec.eta, rdt)
    omega = jnp.asarray(spec.omega_grid(), rdt)
    dosgrid = jnp.asarray(spec.dos_grid(), rdt)

    dc = dc_conductivity(evals, f, J2, beta, eta, N, use_pallas=use_pallas)
    sigma = optical_conductivity(omega, evals, f, J2, eta, N,
                                 use_pallas=use_pallas)
    dos = density_of_states(lat, dosgrid, evals, evecs, eta)
    dosan = antinodal_dos(lat, dosgrid, evals, evecs, eta)
    ak0 = fermi_surface_map(lat, evals, evecs, eta)

    return SpectrumResult(
        superfluid_stiffness=stiffness, dc_conductivity=dc,
        optical_conductivity=sigma, dos=dos, dos_AN=dosan, A_k0=ak0,
    )
