#!/usr/bin/env python
"""β-scan benchmark vs BCS with acceptance tracking
(rebuild of scripts/benchmark_beta_scan.jl).

12×12 clean lattice, J=1.6, log-spaced β grid; the chain is warm-started
across β points (benchmark_beta_scan.jl:65-72) — because β is a traced
scalar here, every β point reuses the same compiled sweep.  Writes
benchmark_beta_scan.csv with Global/Pair/RHS/Diff/AccRate columns
(benchmark_beta_scan.jl:168-173).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=12)
    p.add_argument("--J", type=float, default=1.6)
    p.add_argument("--n_beta", type=int, default=12)
    p.add_argument("--beta_min", type=float, default=1.0)
    p.add_argument("--beta_max", type=float, default=5000.0)
    p.add_argument("--n_therm", type=int, default=30)
    p.add_argument("--n_measure", type=int, default=60)
    p.add_argument("--Nt", type=int, default=10)
    p.add_argument("--dtype", default="float64")
    p.add_argument("--out", default="data/benchmark_beta_scan.csv")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--path", choices=("complex", "real"), default="complex")
    p.add_argument("--eigh_mode", choices=("exact", "tracked"),
                   default="exact")
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))

    import jax.numpy as jnp

    from dwavehmc_tpu import (
        LatticeSpec, calc_optimal_dt, hmc_sweep, init_chain_state,
        make_params, uniform_dwave_delta,
    )
    from dwavehmc_tpu.models.bcs import bcs_gap_rhs

    if ns.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if ns.dtype == "float64" else jnp.float32

    t, tp, mu = 1.0, -0.35, -1.08
    lat = LatticeSpec(ns.L, ns.L)
    betas = np.logspace(np.log10(ns.beta_min), np.log10(ns.beta_max),
                        ns.n_beta)

    params = make_params(t=t, tp=tp, mu=mu, W=0.0, n_imp=0.0,
                         beta=betas[0], J=ns.J, mass=1.0, dtype=dtype)

    if ns.path == "real":
        from dwavehmc_tpu.models.observables_real import (
            measure_observables_real as measure_fn,
        )
        from dwavehmc_tpu.sampler.hmc_real import (
            hmc_sweep_real, init_chain_state_real,
        )
        d0_re = jnp.zeros((lat.n_sites, 2), dtype=dtype)
        d0_re = d0_re.at[:, 0].set(0.2).at[:, 1].set(-0.2)
        state = init_chain_state_real(
            lat, params, jax.random.PRNGKey(ns.seed), delta0_re=d0_re,
            delta0_im=jnp.zeros_like(d0_re), dtype=dtype, n_imp=0.0)
        sweep = jax.jit(
            lambda p, s, Nt, dt: hmc_sweep_real(lat, p, s, Nt, dt,
                                                ns.eigh_mode),
            static_argnums=(2,))
    else:
        from dwavehmc_tpu.models.observables import (
            measure_observables as measure_fn,
        )
        state = init_chain_state(
            lat, params, jax.random.PRNGKey(ns.seed),
            delta0=uniform_dwave_delta(lat, 0.2, dtype=dtype),
            dtype=dtype, n_imp=0.0)
        sweep = jax.jit(lambda p, s, Nt, dt: hmc_sweep(lat, p, s, Nt, dt),
                        static_argnums=(2,))
    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    rows = []
    for b in betas:
        params = params._replace(beta=jnp.asarray(b, dtype))
        dt = calc_optimal_dt(b, ns.J, 1.0, ns.Nt)
        for _ in range(ns.n_therm):
            state, _ = sweep(params, state, ns.Nt, dt)
        acc, globs, pairs, diffs = 0, [], [], []
        for _ in range(ns.n_measure):
            state, info = sweep(params, state, ns.Nt, dt)
            acc += int(info.accepted)
            obs = measure_fn(lat, params, state)
            globs.append(float(obs.delta_global))
            pairs.append(float(obs.delta_pair))
            diffs.append(float(obs.delta_diff))
        g, pr, df = np.mean(globs), np.mean(pairs), np.mean(diffs)
        rhs = bcs_gap_rhs(g, lat, t, tp, mu, b, ns.J)
        rate = acc / ns.n_measure
        rows.append((b, g, pr, rhs, abs(g - rhs), df, rate))
        print(f"beta={b:10.3f}  Global={g:.5f}  Pair={pr:.5f}  "
              f"RHS={rhs:.5f}  Diff={abs(g-rhs):.5f}  Acc={rate:.2f}")

    with open(ns.out, "w") as f:
        f.write("Beta,Global,Pair,RHS,Diff,Delta_Diff,AccRate\n")
        for r in rows:
            f.write(",".join(f"{x:.6g}" for x in r) + "\n")
    print("wrote", ns.out)


if __name__ == "__main__":
    main()
