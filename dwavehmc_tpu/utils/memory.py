"""Device-memory footprint estimation.

The reference audits Julia allocations with @allocated
(scripts/test_memory.jl) — meaningless under XLA, where buffers are
compiler-managed.  The TPU-relevant question is *peak HBM per chip*:
whether an ensemble of 2N×2N eigenproblems fits.  This gives a
shape-derived estimate for planning batch sizes (e.g. "≥64 realizations of
24×24 per v5e core", BASELINE.md target).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..models.lattice import LatticeSpec


@dataclasses.dataclass
class MemoryEstimate:
    state_bytes: int        # HMCState leaves per chain
    eigh_work_bytes: int    # eigh workspace (QDWH needs a few dense copies)
    transport_bytes: int    # J_mn + temporaries per chain
    per_chain_bytes: int
    n_chains: int
    total_bytes: int

    def fits(self, hbm_bytes: int = 16 * 2**30, headroom: float = 0.8) -> bool:
        return self.total_bytes <= hbm_bytes * headroom

    def __str__(self):
        gb = 2**30
        return (f"{self.n_chains} chains x {self.per_chain_bytes/2**20:.1f} "
                f"MiB = {self.total_bytes/gb:.2f} GiB "
                f"(state {self.state_bytes/2**20:.1f} MiB, eigh work "
                f"{self.eigh_work_bytes/2**20:.1f} MiB, transport "
                f"{self.transport_bytes/2**20:.1f} MiB per chain)")


def estimate_memory(lat: LatticeSpec, n_chains: int,
                    dtype=jnp.float32, with_transport: bool = True,
                    eigh_copies: int = 4) -> MemoryEstimate:
    """Rough peak-HBM model, calibrated on hardware at 32×32
    (2026-08-21): batch 40 fits a 16 GiB v5e chip, batch 48
    RESOURCE_EXHAUSTs inside the tracked segment — the peak holds the
    CARRIED state and the PROPOSAL state simultaneously (accept
    double-buffering) plus rotation temporaries, on top of the eigh
    workspace.  ``eigh_copies``: dense (2N)² complex buffers alive
    inside XLA's QDWH eigh (input, polar iterate, accumulators)."""
    N = lat.n_sites
    dim = 2 * N
    r = jnp.dtype(dtype).itemsize
    c = 2 * r

    evecs = dim * dim * c
    state = (2 * N * 2 * c          # delta, pi
             + N * r                # disorder
             + dim * r              # evals
             + evecs)               # evecs
    eigh_work = eigh_copies * dim * dim * c
    transport = (2 * dim * dim * c  # J_mn + JU temp
                 + dim * dim * r)   # |J|²
    tracked_work = 3 * dim * dim * r   # rotation matmul temporaries
    per_chain = (2 * state          # carried + proposal (accept phase)
                 + eigh_work + tracked_work
                 + (transport if with_transport else 0))
    return MemoryEstimate(
        state_bytes=state, eigh_work_bytes=eigh_work,
        transport_bytes=transport if with_transport else 0,
        per_chain_bytes=per_chain, n_chains=n_chains,
        total_bytes=per_chain * n_chains)


def max_chains(lat: LatticeSpec, dtype=jnp.float32,
               hbm_bytes: int = 16 * 2**30, headroom: float = 0.8,
               with_transport: bool = True) -> int:
    one = estimate_memory(lat, 1, dtype, with_transport).per_chain_bytes
    return max(1, int(hbm_bytes * headroom) // one)
