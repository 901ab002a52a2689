"""Hermitian eigensolver variants for the BdG hot kernel.

The entire HMC cost is dominated by eigendecompositions of 2N×2N complex
Hermitian matrices (SURVEY §3.2).  Two interchangeable implementations:

 * ``eigh_complex`` — XLA's native complex Hermitian eigh (default).
 * ``eigh_real_embedding`` — embeds H = A + iB into the 4N×4N real
   symmetric [[A, −B], [B, A]], whose spectrum is that of H with every
   eigenvalue doubled; complex eigenvectors are recovered as u = x + iy
   from one real eigenvector [x; y] per pair.  Real eigh uses different
   XLA kernels than complex eigh on TPU — this lets the benchmark race
   them on hardware.

Eigenvector recovery assumes a (generically) simple complex spectrum: each
doubled eigenvalue's 2-dim real eigenspace maps to ONE complex eigenvector
up to phase, and every physical quantity downstream (forces, observables,
transport) is phase-invariant (ρ = U f U†, |J_nm|², |u|²).
"""

from __future__ import annotations

import jax.numpy as jnp


def eigh_complex(H):
    return jnp.linalg.eigh(H)


def eigh_real_embedding(H):
    """eigh of complex Hermitian H via the real-symmetric embedding.

    Returns (evals (d,), evecs (d, d) complex) matching eigh_complex up to
    per-column phase.
    """
    d = H.shape[-1]
    A = H.real
    B = H.imag
    top = jnp.concatenate([A, -B], axis=-1)
    bot = jnp.concatenate([B, A], axis=-1)
    M = jnp.concatenate([top, bot], axis=-2)          # (2d, 2d) real symmetric
    w, V = jnp.linalg.eigh(M)                          # ascending, pairs
    # every eigenvalue appears twice consecutively; take one per pair
    evals = w[..., ::2]
    X = V[..., :d, ::2]
    Y = V[..., d:, ::2]
    U = X + 1j * Y
    # normalize: ‖[x;y]‖=1 ⇒ ‖u‖=1 already; enforce against roundoff
    U = U / jnp.linalg.norm(U, axis=-2, keepdims=True)
    return evals, U


_IMPLS = {
    "complex": eigh_complex,
    "real_embedding": eigh_real_embedding,
}


def get_eigh(impl: str = "complex"):
    return _IMPLS[impl]
