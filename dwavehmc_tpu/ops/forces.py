"""HMC force kernel: pairing correlations from eigenpairs, vectorized.

Rebuilds compute_forces! (src/Observables.jl:14-62).  The reference runs a
per-bond Σ_n loop (O(8N²) scalar FLOPs); here the same contraction is four
row-gathers plus four fused multiply-reduce rows — pure VPU work with no
data-dependent control flow:

    ρ_{u,v} = Σ_n U[u,n] f(E_n) conj(U[v,n])
    P_ij    = −ρ_{i, j+N} − ρ_{j, i+N}          (j = i+x̂ or i+ŷ)
    F_ij    = −β/(2J) · (Δ_ij − J·P_ij)

Wirtinger convention: F = −∂H_HMC/∂Δ*, verified by the finite-difference
test in tests/test_forces.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.lattice import LatticeSpec, neighbor_tables
from .spectral import fermi_factors


def pairing_correlations(lat: LatticeSpec, evals, evecs, beta):
    """P (N, 2): ⟨c_{i↑}c_{j↓} − c_{i↓}c_{j↑}⟩ on +x (col 0) and +y (col 1).

    (src/Observables.jl:37-53 restated as batched row contractions.)
    """
    N = lat.n_sites
    nn, _ = neighbor_tables(lat)
    jx, jy = nn[:, 0], nn[:, 1]

    f = fermi_factors(evals, beta)           # (2N,)
    W = evecs * f[None, :]                   # U · diag(f)
    Uc = evecs.conj()

    Wt, Wb = W[:N], W[N:]                    # particle / hole rows of U·diag(f)
    Ub_c = Uc[N:]                            # conj hole rows

    # ρ1 = ρ_{i, j+N}: rows i of W against conj rows j+N of U
    rho1x = jnp.einsum("in,in->i", Wt, Ub_c[jx])
    rho1y = jnp.einsum("in,in->i", Wt, Ub_c[jy])
    # ρ2 = ρ_{j, i+N}: rows j of W against conj rows i+N of U
    rho2x = jnp.einsum("in,in->i", W[jx], Ub_c)
    rho2y = jnp.einsum("in,in->i", W[jy], Ub_c)
    del Wb

    Px = -(rho1x + rho2x)
    Py = -(rho1y + rho2y)
    return jnp.stack([Px, Py], axis=1)


def hmc_forces(lat: LatticeSpec, delta, evals, evecs, beta, J):
    """F = −β/(2J)·(Δ − J·P)  (src/Observables.jl:55-57)."""
    P = pairing_correlations(lat, evals, evecs, beta)
    return -(beta / (2.0 * J)) * (delta - J * P), P
