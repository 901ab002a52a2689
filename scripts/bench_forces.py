#!/usr/bin/env python
"""Force-kernel microbenchmark + equivalence check
(rebuild of scripts/bench_forces.jl).

Compares the production row-contraction kernel against an alternative
matmul-diagonal formulation; both must agree to 1e−10 (the reference's
kernel-equivalence bar, bench_forces.jl:125-129), then times them.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--dtype", default="float32")
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))
    if ns.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from dwavehmc_tpu import LatticeSpec, make_params
    from dwavehmc_tpu.models.lattice import neighbor_tables
    from dwavehmc_tpu.ops.forces import pairing_correlations
    from dwavehmc_tpu.ops.spectral import fermi_factors
    from dwavehmc_tpu.parallel.ensemble import init_ensemble

    dtype = jnp.float64 if ns.dtype == "float64" else jnp.float32
    lat = LatticeSpec(ns.L, ns.L)
    beta = 10.0
    params = make_params(W=1.0, n_imp=0.05, beta=beta, J=0.8, dtype=dtype)
    states = init_ensemble(lat, params, jax.random.PRNGKey(0), ns.batch,
                           dtype=dtype, n_imp=0.05)

    N = lat.n_sites
    nn, _ = neighbor_tables(lat)
    jx, jy = nn[:, 0], nn[:, 1]

    def variant_rowcontract(evals, evecs):
        return pairing_correlations(lat, evals, evecs, beta)

    def variant_matmul(evals, evecs):
        """Full ρ = W U† then gather the needed elements — BLAS3-heavy
        (the reference's 'BLAS is almost always best' instinct,
        doc/algorithm.md:101), O((2N)³) vs O(8N²)."""
        f = fermi_factors(evals, beta)
        W = evecs * f[None, :]
        rho = W @ evecs.conj().T
        Px = -(rho[np.arange(N), jx + N] + rho[jx, np.arange(N) + N])
        Py = -(rho[np.arange(N), jy + N] + rho[jy, np.arange(N) + N])
        return jnp.stack([Px, Py], axis=1)

    v1 = jax.jit(jax.vmap(variant_rowcontract))
    v2 = jax.jit(jax.vmap(variant_matmul))

    P1 = v1(states.evals, states.evecs)
    P2 = v2(states.evals, states.evecs)
    diff = float(jnp.max(jnp.abs(P1 - P2)))
    tol = 1e-10 if ns.dtype == "float64" else 1e-4
    print(f"kernel equivalence: max|ΔP| = {diff:.2e} (tol {tol:.0e}) "
          f"{'OK' if diff < tol else 'FAIL'}")

    for name, fn in (("row-contract O(N²)", v1), ("matmul-diag O(N³)", v2)):
        fn(states.evals, states.evecs)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(ns.reps):
            out = fn(states.evals, states.evecs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ns.reps
        print(f"{name:22s}: {dt*1e3:8.3f} ms/call "
              f"(batch {ns.batch}, {ns.L}x{ns.L})")


if __name__ == "__main__":
    main()
