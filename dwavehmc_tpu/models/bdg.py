"""Bogoliubov–de Gennes Hamiltonian assembly, fully vectorized for XLA.

TPU-native rebuild of the reference's ``init_static_H!`` /
``update_H_BdG!`` (src/Hamiltonian.jl:10-86).  The reference fills only the
upper triangle of a LAPACK ``Hermitian(:U)`` wrapper; here we materialize
the full Hermitian 2N×2N matrix (both triangles) because XLA's ``eigh``
takes the dense matrix, and we split it into

  H = H_static(disorder)  +  P(Δ)            (pairing in the off-diagonal
                                               Nambu blocks)

so the static part is computed once per chain and the per-leapfrog-step
work is a single O(N) scatter-add plus an O((2N)²) add.

Conventions (must match reference exactly — every sign is physics):
 * particle block     h_ij = −t (NN) − t' (NNN) + (w_i − μ) δ_ij
 * hole block         −h*  = +t, +t', −(w_i − μ)    (h real ⇒ −h* = −h^T = −h)
 * pairing block      TR[i, j+N] = TR[j, i+N] = Δ_ij / 2  for +x,+y bonds
   (src/Hamiltonian.jl:68-83), bottom-left = TR†.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .lattice import LatticeSpec, neighbor_tables


@functools.lru_cache(maxsize=None)
def adjacency(lat: LatticeSpec) -> tuple[np.ndarray, np.ndarray]:
    """(A_nn, A_nnn) dense 0/1 adjacency constants of shape (N, N).

    Built from all 4 directions so both (i,j) and (j,i) are set — the full
    Hermitian matrix, unlike the reference's upper-triangle-only fill
    (src/Hamiltonian.jl:26-44).  Additive scatter would double-count the
    double bonds of an L=2 torus where the reference's overwrite counts
    them once; LatticeSpec rejects L<3, making that regime unreachable.
    """
    nn, nnn = neighbor_tables(lat)
    N = lat.n_sites

    def build(table):
        A = np.zeros((N, N), dtype=np.float64)
        rows = np.repeat(np.arange(N), table.shape[1])
        np.add.at(A, (rows, table.reshape(-1)), 1.0)
        return A

    return build(nn), build(nnn)


@functools.lru_cache(maxsize=None)
def pairing_scatter_indices(lat: LatticeSpec) -> tuple[np.ndarray, np.ndarray]:
    """Row/col index constants for scattering Δ into the top-right block.

    Each +x bond (i → jx) contributes Δx[i]/2 at (i, jx) and (jx, i) of the
    N×N top-right block; likewise +y (src/Hamiltonian.jl:68-83).  Order of
    values: [Δx at (i,jx), Δx at (jx,i), Δy at (i,jy), Δy at (jy,i)].
    """
    nn, _ = neighbor_tables(lat)
    i = np.arange(lat.n_sites)
    jx, jy = nn[:, 0], nn[:, 1]
    rows = np.concatenate([i, jx, i, jy]).astype(np.int32)
    cols = np.concatenate([jx, i, jy, i]).astype(np.int32)
    return rows, cols


def static_hamiltonian(lat: LatticeSpec, t, tp, mu, disorder) -> jnp.ndarray:
    """Kinetic + potential part of H_BdG (src/Hamiltonian.jl:10-47).

    Real entries stored in the complex dtype of the pairing field.
    """
    A_nn, A_nnn = adjacency(lat)
    dtype = jnp.asarray(disorder).dtype
    A_nn = jnp.asarray(A_nn, dtype)
    A_nnn = jnp.asarray(A_nnn, dtype)
    diag = disorder - mu                                     # (N,)
    h = -t * A_nn - tp * A_nnn + jnp.diag(diag)              # particle block
    z = jnp.zeros_like(h)
    top = jnp.concatenate([h, z], axis=1)
    bot = jnp.concatenate([z, -h], axis=1)                   # hole block −h* = −h
    return jnp.concatenate([top, bot], axis=0)


def pairing_block(lat: LatticeSpec, delta) -> jnp.ndarray:
    """Top-right N×N Nambu block TR(Δ) via one scatter-add.

    ``delta`` is (N, 2) complex: column 0 = +x bond, column 1 = +y bond.
    """
    rows, cols = pairing_scatter_indices(lat)
    half = 0.5 * delta
    vals = jnp.concatenate([half[:, 0], half[:, 0], half[:, 1], half[:, 1]])
    TR = jnp.zeros((lat.n_sites, lat.n_sites), dtype=delta.dtype)
    return TR.at[rows, cols].add(vals)


def assemble_bdg(lat: LatticeSpec, H_static, delta) -> jnp.ndarray:
    """Full Hermitian H_BdG = H_static + [[0, TR], [TR†, 0]].

    Equivalent of update_H_BdG! (src/Hamiltonian.jl:55-86) but pure.
    """
    N = lat.n_sites
    TR = pairing_block(lat, delta)
    H = H_static.astype(delta.dtype)
    H = H.at[:N, N:].add(TR)
    H = H.at[N:, :N].add(TR.conj().T)
    return H


def diagonalize(H) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hermitian eigendecomposition (ascending), the hot kernel.

    Replaces LAPACK ``eigen!(Hermitian(…))`` (src/Hamiltonian.jl:96-114).
    Batched over leading ensemble axes by vmap; XLA lowers to its TPU eigh.
    Implementation selected once per process via DWAVEHMC_EIGH_IMPL
    ("complex" default | "real_embedding" — see ops/eigh.py).
    """
    import os

    from ..ops.eigh import get_eigh

    return get_eigh(os.environ.get("DWAVEHMC_EIGH_IMPL", "complex"))(H)
