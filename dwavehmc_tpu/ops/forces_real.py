"""Complex-free force kernel: pairing correlations from (X, Y) eigenvector
pairs.  Same math as ops/forces.py (src/Observables.jl:14-62) with

    ρ_{uv} = Σ_n (X_u + iY_u) f_n (X_v − iY_v)
    Re ρ   = Σ_n f (X_u X_v + Y_u Y_v)
    Im ρ   = Σ_n f (Y_u X_v − X_u Y_v)

evaluated as real row contractions — eight einsums per bond direction.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.lattice import LatticeSpec, neighbor_tables
from .spectral import fermi_factors


def pairing_correlations_real(lat: LatticeSpec, evals, X, Y, beta):
    """(P_re, P_im), each (N, 2): P = −ρ_{i,j+N} − ρ_{j,i+N}."""
    N = lat.n_sites
    nn, _ = neighbor_tables(lat)

    f = fermi_factors(evals, beta)          # (2N,)
    WX = X * f[None, :]
    WY = Y * f[None, :]

    def rho(rows_u, rows_v):
        """ρ rows: u-rows against v-rows (both index the 2N-dim space)."""
        xu, yu = WX[rows_u], WY[rows_u]
        xv, yv = X[rows_v], Y[rows_v]
        re = jnp.einsum("in,in->i", xu, xv) + jnp.einsum("in,in->i", yu, yv)
        im = jnp.einsum("in,in->i", yu, xv) - jnp.einsum("in,in->i", xu, yv)
        return re, im

    i = jnp.arange(N)
    out_re, out_im = [], []
    for d in range(2):
        j = nn[:, d]
        r1re, r1im = rho(i, j + N)          # ρ_{i, j+N}
        r2re, r2im = rho(j, i + N)          # ρ_{j, i+N}
        out_re.append(-(r1re + r2re))
        out_im.append(-(r1im + r2im))
    return jnp.stack(out_re, 1), jnp.stack(out_im, 1)


def hmc_forces_real(lat: LatticeSpec, delta_re, delta_im, evals, X, Y,
                    beta, J):
    """F = −β/(2J)(Δ − J·P) in real parts; returns (F_re, F_im, P_re, P_im)."""
    P_re, P_im = pairing_correlations_real(lat, evals, X, Y, beta)
    c = beta / (2.0 * J)
    return (-c * (delta_re - J * P_re), -c * (delta_im - J * P_im),
            P_re, P_im)
