#!/usr/bin/env python
"""Correctness benchmark vs BCS mean-field theory
(rebuild of scripts/benchmark_clean.jl).

Clean 10×10 lattice, β=180, J=1.6, uniform d-wave start; the HMC average
⟨|Δ_global|⟩ must satisfy the momentum-space gap equation to < 0.02
(benchmark_clean.jl:112-123).  Pass --fast for a cheaper 8×8/β=100 variant.
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
    p.add_argument("--L", type=int, default=10)
    p.add_argument("--beta", type=float, default=180.0)
    p.add_argument("--J", type=float, default=1.6)
    p.add_argument("--n_therm", type=int, default=50)
    p.add_argument("--n_measure", type=int, default=100)
    p.add_argument("--Nt_therm", type=int, default=20)
    p.add_argument("--Nt_measure", type=int, default=5)
    p.add_argument("--dtype", default="float64")
    p.add_argument("--fast", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--path", choices=("complex", "real"), default="complex",
                   help="compute path; 'real' is the complex-free TPU path")
    p.add_argument("--eigh_mode", choices=("exact", "tracked"),
                   default="exact")
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))
    if ns.fast:
        ns.L, ns.beta, ns.n_therm, ns.n_measure = 8, 100.0, 40, 60

    import jax.numpy as jnp

    from dwavehmc_tpu import (
        LatticeSpec, calc_optimal_dt, hmc_sweep, init_chain_state,
        make_params, uniform_dwave_delta,
    )
    from dwavehmc_tpu.models.bcs import bcs_gap_rhs
    from dwavehmc_tpu.models.observables import measure_observables

    dtype = jnp.float64 if ns.dtype == "float64" else jnp.float32
    if ns.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    t, tp, mu = 1.0, -0.35, -1.08
    lat = LatticeSpec(ns.L, ns.L)
    params = make_params(t=t, tp=tp, mu=mu, W=0.0, n_imp=0.0, beta=ns.beta,
                         J=ns.J, mass=1.0, dtype=dtype)

    if ns.path == "real":
        from dwavehmc_tpu.models.observables_real import (
            measure_observables_real as measure_fn,
        )
        from dwavehmc_tpu.sampler.hmc_real import (
            hmc_sweep_real, init_chain_state_real,
        )
        # build the uniform d-wave start without complex intermediates
        # (complex dtypes are unsupported on the target TPU runtime)
        d0_re = jnp.zeros((lat.n_sites, 2), dtype=dtype)
        d0_re = d0_re.at[:, 0].set(0.2).at[:, 1].set(-0.2)
        state = init_chain_state_real(
            lat, params, jax.random.PRNGKey(ns.seed),
            delta0_re=d0_re, delta0_im=jnp.zeros_like(d0_re),
            dtype=dtype, n_imp=0.0)
        sweep = jax.jit(
            lambda p, s, Nt, dt: hmc_sweep_real(lat, p, s, Nt, dt,
                                                ns.eigh_mode),
            static_argnums=(2,))
    else:
        measure_fn = measure_observables
        state = init_chain_state(
            lat, params, jax.random.PRNGKey(ns.seed),
            delta0=uniform_dwave_delta(lat, 0.2, dtype=dtype),
            dtype=dtype, n_imp=0.0)
        sweep = jax.jit(lambda p, s, Nt, dt: hmc_sweep(lat, p, s, Nt, dt),
                        static_argnums=(2,))

    print("=== Benchmark: Clean Limit (Momentum Space Check) ===")
    print(f"{ns.L}x{ns.L}, beta={ns.beta}, J={ns.J}, dtype={ns.dtype}, "
          f"path={ns.path}, device={jax.devices()[0]}")

    t0 = time.time()
    dt_th = calc_optimal_dt(ns.beta, ns.J, 1.0, ns.Nt_therm)
    print("Thermalizing...")
    for _ in range(ns.n_therm):
        state, _ = sweep(params, state, ns.Nt_therm, dt_th)

    print("Measuring...")
    dt_me = calc_optimal_dt(ns.beta, ns.J, 1.0, ns.Nt_measure)
    hist, acc = [], 0
    for i in range(ns.n_measure):
        state, info = sweep(params, state, ns.Nt_measure, dt_me)
        acc += int(info.accepted)
        obs = measure_fn(lat, params, state)
        hist.append(float(obs.delta_global))
        if (i + 1) % 20 == 0:
            print(f"  sweep {i+1}: |Δ_global|={hist[-1]:.6f} "
                  f"diff={float(obs.delta_diff):.6f}")

    gap = float(np.mean(hist))
    std = float(np.std(hist))
    rhs = bcs_gap_rhs(gap, lat, t, tp, mu, ns.beta, ns.J)
    diff = abs(gap - rhs)
    print("\n--- Results ---")
    print(f"HMC <|Δ_global|>: {gap:.6f} +/- {std:.6f}")
    print(f"BCS RHS(Δ_hmc)  : {rhs:.6f}")
    print(f"Difference      : {diff:.6f} ({diff/max(gap,1e-12)*100:.2f}%)")
    print(f"Acceptance      : {acc/ns.n_measure:.2f}")
    print(f"Wall time       : {time.time()-t0:.1f}s")
    if diff < 0.02:
        print(">>> Benchmark 1 Passed! HMC result matches Mean Field theory.")
        return 0
    print(">>> Benchmark 1 FAILED: deviation too large.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
