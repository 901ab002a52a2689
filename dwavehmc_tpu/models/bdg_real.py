"""Complex-free BdG path: real-symmetric embedding assembled directly.

TPUs compute on real tiles; XLA lowers complex arithmetic to real pairs —
and some TPU runtimes (including the one this framework targets first)
only execute real dtypes.  This module therefore never materializes a
complex array: the complex Hermitian H = A + iB (2N×2N) is built directly
as the real symmetric embedding

    M = [[A, −B], [B, A]]        (4N × 4N)

whose spectrum is that of H with each eigenvalue doubled, and whose
eigenvectors [x; y] give the complex eigenvectors u = x + iy.  Semantics
match models/bdg.py exactly (same reference conventions,
src/Hamiltonian.jl:10-86); equality is enforced by tests.

Block structure (TR = pairing block, complex-symmetric TR = TRᵀ):
    A = H_static + [[0, TRr], [TRr, 0]]      (symmetric)
    B =            [[0, TRi], [−TRi, 0]]     (antisymmetric)
with TRr/TRi the real/imag parts of the Δ/2 scatter.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .bdg import adjacency
from .lattice import LatticeSpec, neighbor_tables


@functools.lru_cache(maxsize=None)
def embedding_scatter_indices(lat: LatticeSpec
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                         np.ndarray]:
    """(rows, cols, signs, source) for scattering Δ into M in one shot.

    ``source`` indexes a flat value vector [Δr_x, Δr_y, Δi_x, Δi_y] (each
    length N); every bond contributes 16 scatter points (4 A-positions × 2
    diagonal copies + 4 B-positions × 2 off-diagonal copies) with ``signs``
    carrying the antisymmetry of B and the −B top-right block.
    """
    nn, _ = neighbor_tables(lat)
    N = lat.n_sites
    dim = 2 * N   # complex dimension; M is (2*dim, 2*dim)
    i = np.arange(N)

    rows, cols, signs, src = [], [], [], []

    def add(r, c, s, k):
        rows.append(r)
        cols.append(c)
        signs.append(np.full(N, s, dtype=np.float64))
        src.append(k)

    for b, jmap in ((0, nn[:, 0]), (1, nn[:, 1])):   # +x, +y bonds
        j = jmap
        re_k = np.full(N, b, dtype=np.int64) * N + i          # Δr column b
        im_k = np.full(N, 2 + b, dtype=np.int64) * N + i      # Δi column b
        # A entries (value Δr/2), symmetric, at both diagonal copies
        for (r, c) in ((i, j + N), (j + N, i), (j, i + N), (i + N, j)):
            add(r, c, +1.0, re_k)                  # M[r, c]           += Δr/2
            add(r + dim, c + dim, +1.0, re_k)      # M[r+2N, c+2N]     += Δr/2
        # B entries (value Δi/2): B[r,c]=+v at (i,j+N),(j,i+N);
        # antisymmetric partners get −v.  M gets +B bottom-left, −B top-right.
        for (r, c, s) in ((i, j + N, +1.0), (j + N, i, -1.0),
                          (j, i + N, +1.0), (i + N, j, -1.0)):
            add(r + dim, c, +s, im_k)              # bottom-left  +B
            add(r, c + dim, -s, im_k)              # top-right    −B
    return (np.concatenate(rows).astype(np.int32),
            np.concatenate(cols).astype(np.int32),
            np.concatenate(signs),
            np.concatenate(src).astype(np.int32))


def static_embedding(lat: LatticeSpec, t, tp, mu, disorder) -> jnp.ndarray:
    """M_static: the real H_static placed on both diagonal blocks
    (H_static is purely real: hopping + site terms, src/Hamiltonian.jl:10-47).
    """
    A_nn, A_nnn = adjacency(lat)
    dtype = jnp.asarray(disorder).dtype
    A_nn = jnp.asarray(A_nn, dtype)
    A_nnn = jnp.asarray(A_nnn, dtype)
    diag = disorder - mu
    h = -t * A_nn - tp * A_nnn + jnp.diag(diag)
    z = jnp.zeros_like(h)
    Hs = jnp.concatenate([jnp.concatenate([h, z], 1),
                          jnp.concatenate([z, -h], 1)], 0)      # (2N, 2N)
    dim = Hs.shape[0]
    M = jnp.zeros((2 * dim, 2 * dim), dtype=Hs.dtype)
    M = M.at[:dim, :dim].set(Hs)
    M = M.at[dim:, dim:].set(Hs)
    return M


def assemble_embedding(lat: LatticeSpec, M_static, delta_re, delta_im
                       ) -> jnp.ndarray:
    """M(Δ) = M_static + pairing scatter.  delta_re/delta_im: (N, 2) real."""
    rows, cols, signs, src = embedding_scatter_indices(lat)
    vals_flat = 0.5 * jnp.concatenate(
        [delta_re[:, 0], delta_re[:, 1], delta_im[:, 0], delta_im[:, 1]])
    vals = jnp.asarray(signs, M_static.dtype) * vals_flat[src]
    return M_static.at[rows, cols].add(vals)


def assemble_parts(lat: LatticeSpec, Hs_real, delta_re, delta_im
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Hr, Hi) real/imag parts of the 2N×2N complex H (for the tracked
    eigensolver, which works on complex pairs rather than the embedding).

    Hr = H_static + [[0, TRr], [TRr, 0]],  Hi = [[0, TRi], [−TRi, 0]]
    with TR the (complex-symmetric) Δ/2 pairing scatter.
    """
    from .bdg import pairing_scatter_indices

    N = lat.n_sites
    rows, cols = pairing_scatter_indices(lat)
    dtype = Hs_real.dtype

    def tr_block(vals_col):
        half = 0.5 * vals_col
        vals = jnp.concatenate([half[:, 0], half[:, 0], half[:, 1], half[:, 1]])
        return jnp.zeros((N, N), dtype=dtype).at[rows, cols].add(vals)

    TRr = tr_block(delta_re)
    TRi = tr_block(delta_im)
    Hr = Hs_real.at[:N, N:].add(TRr).at[N:, :N].add(TRr.T)
    Hi = jnp.zeros_like(Hs_real).at[:N, N:].add(TRi).at[N:, :N].add(-TRi.T)
    return Hr, Hi


def diagonalize_embedding(M) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(evals (2N,), X (2N,2N), Y (2N,2N)): one eigenpair per doubled level;
    the complex eigenvectors are U = X + iY (phase-arbitrary, which every
    downstream quantity is invariant to)."""
    w, V = jnp.linalg.eigh(M)
    dim = M.shape[-1] // 2
    evals = w[..., ::2]
    X = V[..., :dim, ::2]
    Y = V[..., dim:, ::2]
    return evals, X, Y
