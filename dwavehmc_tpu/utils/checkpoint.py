"""Checkpoint / deterministic resume — a capability the reference lacks
entirely (SURVEY §5: no mechanism to save/restore state.Δ or RNG).

Saves the Markov state (Δ, π, disorder, PRNG key) and the sweep counter
to a single .npz, plus any caller-supplied ``extra`` arrays (the driver
passes the spectra store's partial-bin accumulator through this channel).
``load_checkpoint`` re-diagonalizes the eigenpairs from the saved
(disorder, Δ), so an exact-mode resume continues bit-for-bit on the same
trajectory.  Caveat for tracked/cheap-anchor mode: the restored spectrum
is the *exact* eigh of the saved fields, not the in-flight tracked
approximation, so a tracked-mode resume re-anchors at the checkpoint
(statistically equivalent, not bit-identical).  Adaptive-Nt controller
state is NOT saved — it only exists during thermalization, which always
completes before the first checkpoint is written.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bdg import assemble_bdg, diagonalize, static_hamiltonian
from ..models.lattice import LatticeSpec
from ..models.params import HMCState, ModelParams


def save_checkpoint(path: str, states, sweep_idx: int,
                    extra: dict | None = None):
    """Write a resumable snapshot. ``states`` may be single-chain or an
    ensemble (leading chain axis), complex (HMCState) or real-pair
    (HMCStateReal) — real pairs are recombined to complex on the host, so
    one checkpoint format serves both paths."""
    if hasattr(states, "delta_re"):   # HMCStateReal
        delta = np.asarray(states.delta_re) + 1j * np.asarray(states.delta_im)
        pi = np.asarray(states.pi_re) + 1j * np.asarray(states.pi_im)
    else:
        delta = np.asarray(states.delta)
        pi = np.asarray(states.pi)
    payload = {
        "delta": delta,
        "pi": pi,
        "disorder": np.asarray(states.disorder),
        "key": np.asarray(jax.random.key_data(states.key)),
        "sweep_idx": np.asarray(sweep_idx),
    }
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, lat: LatticeSpec, params: ModelParams,
                    state_path: str = "complex"
                    ) -> tuple[HMCState, int, dict]:
    """Restore state; eigenpairs are recomputed from (disorder, Δ).

    ``state_path``: "complex" → HMCState; "real" → HMCStateReal (the
    complex-free layout, rediagonalized via the real embedding)."""
    with np.load(path) as z:
        delta_np = z["delta"]
        pi_np = z["pi"]
        disorder = jnp.asarray(z["disorder"])
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
        sweep_idx = int(z["sweep_idx"])
        extra = {k[len("extra_"):]: z[k] for k in z.files
                 if k.startswith("extra_")}

    rdt = disorder.dtype
    if state_path == "real":
        from ..models.bdg_real import (
            assemble_embedding, diagonalize_embedding, static_embedding,
        )
        from ..sampler.hmc_real import HMCStateReal

        dre = jnp.asarray(delta_np.real, rdt)
        dim = jnp.asarray(delta_np.imag, rdt)
        pre = jnp.asarray(pi_np.real, rdt)
        pim = jnp.asarray(pi_np.imag, rdt)

        def diag_one(dis, dr, di):
            Ms = static_embedding(lat, params.t, params.tp, params.mu, dis)
            return diagonalize_embedding(assemble_embedding(lat, Ms, dr, di))

        if dre.ndim == 3:
            evals, X, Y = jax.vmap(diag_one)(disorder, dre, dim)
        else:
            evals, X, Y = diag_one(disorder, dre, dim)
        state = HMCStateReal(delta_re=dre, delta_im=dim, pi_re=pre,
                             pi_im=pim, disorder=disorder, evals=evals,
                             X=X, Y=Y, key=key)
        return state, sweep_idx, extra

    delta = jnp.asarray(delta_np)
    pi = jnp.asarray(pi_np)

    def diag_one(dis, d):
        H_static = static_hamiltonian(lat, params.t, params.tp, params.mu, dis)
        return diagonalize(assemble_bdg(lat, H_static, d))

    if delta.ndim == 3:   # ensemble
        evals, evecs = jax.vmap(diag_one)(disorder, delta)
    else:
        evals, evecs = diag_one(disorder, delta)

    state = HMCState(delta=delta, pi=pi, disorder=disorder,
                     evals=evals, evecs=evecs, key=key)
    return state, sweep_idx, extra
