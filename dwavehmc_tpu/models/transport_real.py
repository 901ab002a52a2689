"""Complex-free transport & spectra: the TPU production measurement path.

Mirrors models/transport.py (reference src/Observables.jl:237-526) with all
complex arithmetic expanded into real (X, Y) pairs:

 * current operator Jx = i·K with K real antisymmetric ⇒
   J_mn = i·(R + iI),  |J_mn|² = R² + I²,
   R = XᵀKX + YᵀKY,  I = XᵀKY − YᵀKX          (six real MXU matmuls)
 * stiffness/DC/σ(ω)/DOS identical real formulas on |J|², f, E
 * A(k, 0) via DFT-by-matmul: F = (Cx − iSx) u (Cy − iSy)ᵀ expanded into
   real products — at L ≤ 32 the DFT matrices are tiny constants and the
   whole map is batched einsums (no complex FFT, no data-dependent
   control flow).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .lattice import LatticeSpec, antinodal_phases, neighbor_tables
from .params import ModelParams, SpectralSpec
from .transport import (
    SpectrumResult,
    current_patterns,
    dc_conductivity,
    lorentzian,
    optical_conductivity,
    paramagnetic_term,
)
from ..ops.spectral import fermi_factors


@functools.lru_cache(maxsize=None)
def dft_matrices(L: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, S) with F_{k,x} = exp(−2πi·kx/L) = C − iS  (numpy constants)."""
    k = np.arange(L)[:, None]
    x = np.arange(L)[None, :]
    ang = 2.0 * np.pi * k * x / L
    return np.cos(ang), np.sin(ang)


def current_pattern_matrix(lat: LatticeSpec, t, tp):
    """K (N×N real antisymmetric): Jx_particle = i·K
    (src/Observables.jl:246-274)."""
    B_nn, B_nnn = current_patterns(lat)
    return t * B_nn + tp * B_nnn


def current_J2_real(lat: LatticeSpec, X, Y, t, tp):
    """|J_mn|² (2N×2N real) from eigenvector parts."""
    N = lat.n_sites
    K = current_pattern_matrix(lat, t, tp).astype(X.dtype)
    # blockdiag(K, K) action on the 2N-dim space
    KX = jnp.concatenate([K @ X[:N], K @ X[N:]], axis=0)
    KY = jnp.concatenate([K @ Y[:N], K @ Y[N:]], axis=0)
    R = X.T @ KX + Y.T @ KY
    I = X.T @ KY - Y.T @ KX
    return R * R + I * I


def diamagnetic_term_real(lat: LatticeSpec, evals, X, Y, t, tp, beta):
    """⟨−Kx⟩ with 2Re(u_i ū_j) = X_iX_j + Y_iY_j row contractions
    (src/Observables.jl:344-362)."""
    N = lat.n_sites
    nn, nnn = neighbor_tables(lat)
    Xt, Xb = X[:N], X[N:]
    Yt, Yb = Y[:N], Y[N:]

    def bond_weight(jmap):
        a = (jnp.einsum("in,in->n", Xb, Xb[jmap])
             + jnp.einsum("in,in->n", Yb, Yb[jmap]))
        b = (jnp.einsum("in,in->n", Xt, Xt[jmap])
             + jnp.einsum("in,in->n", Yt, Yt[jmap]))
        return 2.0 * (a - b)

    w = (t * bond_weight(nn[:, 0])
         + tp * bond_weight(nnn[:, 0])
         + tp * bond_weight(nnn[:, 3]))
    return jnp.sum(jnp.where(evals > 0,
                             w * jnp.tanh(0.5 * beta * evals), 0.0)) / N


def density_of_states_real(lat: LatticeSpec, dos_grid, evals, X, Y, eta):
    N = lat.n_sites
    w = jnp.sum(X[:N] ** 2 + Y[:N] ** 2, axis=0)
    L = lorentzian(dos_grid[:, None] - evals[None, :], eta)
    return (L @ w) / N


def antinodal_dos_real(lat: LatticeSpec, dos_grid, evals, X, Y, eta):
    N = lat.n_sites
    p1, p2 = antinodal_phases(lat)
    p1 = jnp.asarray(p1, X.dtype)
    p2 = jnp.asarray(p2, X.dtype)
    w = 0.5 * (((p1 @ X[:N]) ** 2 + (p1 @ Y[:N]) ** 2)
               + ((p2 @ X[:N]) ** 2 + (p2 @ Y[:N]) ** 2)) / N
    L = lorentzian(dos_grid[:, None] - evals[None, :], eta)
    return L @ w


def fermi_surface_map_real(lat: LatticeSpec, evals, X, Y, eta,
                           weight_cutoff=1e-6):
    """A(k, 0) via DFT matmuls (src/Observables.jl:493-518 semantics)."""
    N = lat.n_sites
    wz = lorentzian(-evals, eta)
    w = jnp.where(wz > weight_cutoff, wz, 0.0)

    # site i = y*Lx + x ⇒ (2N, Ly, Lx) with [n, y, x]
    ux = X[:N].T.reshape(-1, lat.Ly, lat.Lx)
    uy = Y[:N].T.reshape(-1, lat.Ly, lat.Lx)
    Cy, Sy = (jnp.asarray(a, X.dtype) for a in dft_matrices(lat.Ly))
    Cx, Sx = (jnp.asarray(a, X.dtype) for a in dft_matrices(lat.Lx))

    # P = (Cy − iSy) · u over the y axis: P[k_y, x]
    pr = jnp.einsum("ky,nyx->nkx", Cy, ux) + jnp.einsum("ky,nyx->nkx", Sy, uy)
    pi = jnp.einsum("ky,nyx->nkx", Cy, uy) - jnp.einsum("ky,nyx->nkx", Sy, ux)
    # Q = P · (Cx − iSx)ᵀ over the x axis: Q[k_y, k_x]
    qr = jnp.einsum("nkx,jx->nkj", pr, Cx) + jnp.einsum("nkx,jx->nkj", pi, Sx)
    qi = jnp.einsum("nkx,jx->nkj", pi, Cx) - jnp.einsum("nkx,jx->nkj", pr, Sx)

    ak_yx = jnp.einsum("n,nkj->kj", w, qr * qr + qi * qi) / N   # [ky, kx]
    return ak_yx.T                                              # (Lx, Ly)


def measure_transport_and_spectra_real(lat: LatticeSpec, spec: SpectralSpec,
                                       params: ModelParams, state,
                                       use_pallas: bool | None = None
                                       ) -> SpectrumResult:
    """Full heavy measurement from an HMCStateReal."""
    if use_pallas is None:
        from ..ops.pallas_kernels import pallas_default
        use_pallas = pallas_default()
    N = lat.n_sites
    beta, t, tp = params.beta, params.t, params.tp
    evals, X, Y = state.evals, state.X, state.Y
    rdt = evals.dtype

    f = fermi_factors(evals, beta)
    J2 = current_J2_real(lat, X, Y, t, tp)

    dia = diamagnetic_term_real(lat, evals, X, Y, t, tp, beta)
    lam = paramagnetic_term(evals, f, J2, beta, N)
    stiffness = dia - lam

    eta = jnp.asarray(spec.eta, rdt)
    omega = jnp.asarray(spec.omega_grid(), rdt)
    dosgrid = jnp.asarray(spec.dos_grid(), rdt)

    dc = dc_conductivity(evals, f, J2, beta, eta, N, use_pallas=use_pallas)
    sigma = optical_conductivity(omega, evals, f, J2, eta, N,
                                 use_pallas=use_pallas)
    dos = density_of_states_real(lat, dosgrid, evals, X, Y, eta)
    dosan = antinodal_dos_real(lat, dosgrid, evals, X, Y, eta)
    ak0 = fermi_surface_map_real(lat, evals, X, Y, eta)

    return SpectrumResult(
        superfluid_stiffness=stiffness, dc_conductivity=dc,
        optical_conductivity=sigma, dos=dos, dos_AN=dosan, A_k0=ak0)
