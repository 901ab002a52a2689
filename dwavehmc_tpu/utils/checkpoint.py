"""Checkpoint / deterministic resume — a capability the reference lacks
entirely (SURVEY §5: no mechanism to save/restore state.Δ or RNG).

Saves the full Markov state (Δ, π, disorder, eigenpairs are rebuilt, PRNG
key), the sweep counter, the adaptive-Nt controller state and the spectra
bin accumulators to a single .npz; ``load_checkpoint`` restores an
``HMCState`` whose eigenpairs are re-diagonalized from the saved fields so
the resumed chain is bit-for-bit on the same trajectory.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bdg import assemble_bdg, diagonalize, static_hamiltonian
from ..models.lattice import LatticeSpec
from ..models.params import HMCState, ModelParams


def save_checkpoint(path: str, states: HMCState, sweep_idx: int,
                    extra: dict | None = None):
    """Write a resumable snapshot. ``states`` may be single-chain or an
    ensemble (leading chain axis)."""
    payload = {
        "delta": np.asarray(states.delta),
        "pi": np.asarray(states.pi),
        "disorder": np.asarray(states.disorder),
        "key": np.asarray(jax.random.key_data(states.key)),
        "sweep_idx": np.asarray(sweep_idx),
    }
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, lat: LatticeSpec, params: ModelParams
                    ) -> tuple[HMCState, int, dict]:
    """Restore state; eigenpairs are recomputed from (disorder, Δ)."""
    with np.load(path) as z:
        delta = jnp.asarray(z["delta"])
        pi = jnp.asarray(z["pi"])
        disorder = jnp.asarray(z["disorder"])
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
        sweep_idx = int(z["sweep_idx"])
        extra = {k[len("extra_"):]: z[k] for k in z.files
                 if k.startswith("extra_")}

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
