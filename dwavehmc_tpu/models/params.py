"""Model parameters and simulation state pytrees.

TPU-native replacement for the reference's ``ModelParameters`` /
``SimulationState`` / ``ComputeCache`` triple (src/Types.jl:14-212).
Instead of a mutate-in-place cache, state is an immutable pytree threaded
through jit-compiled pure functions; physics couplings are traced 0-d
arrays so a temperature scan re-uses one compiled executable.

Shape-determining quantities (lattice size, spectral-grid size) live in
static hashable dataclasses (`LatticeSpec`, `SpectralSpec`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .lattice import LatticeSpec


@dataclasses.dataclass(frozen=True)
class SpectralSpec:
    """Static spectral-grid configuration (src/Types.jl:40-45,82-83).

    ``omega_min = eta`` and ``n_omega = floor((omega_max-omega_min)/domega)+1``
    exactly as the reference constructor computes them.
    """

    eta: float = 0.01
    domega: float = 0.002
    omega_max: float = 4.0

    @property
    def omega_min(self) -> float:
        return self.eta

    @property
    def n_omega(self) -> int:
        return int(np.floor((self.omega_max - self.omega_min) / self.domega)) + 1

    def omega_grid(self) -> np.ndarray:
        """Positive-frequency grid for σ(ω) (src/Observables.jl:396)."""
        return self.omega_min + self.domega * np.arange(self.n_omega)

    def dos_grid(self) -> np.ndarray:
        """Symmetric grid for the DOS (src/Observables.jl:432)."""
        n = int(np.floor(2 * self.omega_max / self.domega)) + 1
        return -self.omega_max + self.domega * np.arange(n)


class ModelParams(NamedTuple):
    """Traced physics couplings (reference fields: src/Types.jl:21-32).

    All leaves are 0-d float arrays so scans over (T, β, J, …) hit the same
    compiled executable.
    """

    t: jax.Array
    tp: jax.Array
    mu: jax.Array
    W: jax.Array
    n_imp: jax.Array
    beta: jax.Array
    J: jax.Array
    mass: jax.Array


def make_params(
    t=1.0, tp=-0.35, mu=-1.08, W=0.0, n_imp=0.0, beta=1.0, J=1.0, mass=1.0,
    dtype=jnp.float32,
) -> ModelParams:
    as_arr = lambda v: jnp.asarray(v, dtype=dtype)
    return ModelParams(
        t=as_arr(t), tp=as_arr(tp), mu=as_arr(mu), W=as_arr(W),
        n_imp=as_arr(n_imp), beta=as_arr(beta), J=as_arr(J), mass=as_arr(mass),
    )


class HMCState(NamedTuple):
    """Per-chain Markov state (replaces SimulationState + the eigenpair slots
    of ComputeCache, src/Types.jl:101-134,156-157).

    An ensemble adds leading batch axes via vmap; `key` is the chain's
    private PRNG key (fixes the reference's global-RNG irreproducibility).
    """

    delta: jax.Array      # (N, 2) complex — bond fields Δ on +x, +y bonds
    pi: jax.Array         # (N, 2) complex — conjugate momenta
    disorder: jax.Array   # (N,) real — site potential w_i ∈ {0, W}
    evals: jax.Array      # (2N,) real — eigenvalues of current H_BdG
    evecs: jax.Array      # (2N, 2N) complex — eigenvectors (columns)
    key: jax.Array        # PRNG key


def complex_dtype_of(real_dtype) -> jnp.dtype:
    return jnp.dtype(jnp.complex128 if jnp.dtype(real_dtype) == jnp.float64 else jnp.complex64)


def sample_disorder(key, lat: LatticeSpec, W, n_imp, dtype=jnp.float32) -> jax.Array:
    """Random impurity potential: a fraction ``n_imp`` of sites set to W.

    Matches src/Types.jl:120-124 (``round(N*n_imp)`` impurities placed via a
    random permutation) but is fully key-deterministic.  The impurity count
    must be concrete for static shapes, so ``n_imp``/``W`` here are python
    floats or 0-d numpy values, not tracers.
    """
    N = lat.n_sites
    n_sites_imp = int(np.rint(N * float(n_imp)))
    perm = jax.random.permutation(key, N)
    pot = jnp.zeros((N,), dtype=dtype)
    return pot.at[perm[:n_sites_imp]].set(jnp.asarray(W, dtype=dtype))


def init_delta(key, lat: LatticeSpec, scale=0.1, dtype=jnp.float32):
    """Small random complex start: (U[0,1)² - (0.5+0.5i))·scale
    (src/Types.jl:128)."""
    cdtype = complex_dtype_of(dtype)
    re, im = jax.random.uniform(key, (2, lat.n_sites, 2), dtype=dtype) - 0.5
    return (re + 1j * im).astype(cdtype) * scale


def uniform_dwave_delta(lat: LatticeSpec, amp=0.2, dtype=jnp.float32):
    """Uniform d-wave start Δx=+amp, Δy=−amp (scripts/benchmark_clean.jl:78-80)."""
    cdtype = complex_dtype_of(dtype)
    d = jnp.zeros((lat.n_sites, 2), dtype=cdtype)
    return d.at[:, 0].set(amp).at[:, 1].set(-amp)
