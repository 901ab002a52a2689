#!/usr/bin/env python
"""HMC tuning study: efficiency = acceptance/Nt vs Nt at fixed trajectory
length (rebuild of scripts/test_scan_Nt_efficiency.jl).

Trajectory length L = T_period/2 with T_period = 4π√(mJ/β)
(test_scan_Nt_efficiency.jl:26-28); for each Nt the step is dt = L/Nt.
Prints the efficiency table and the best Nt.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=8)
    p.add_argument("--beta", type=float, default=20.0)
    p.add_argument("--J", type=float, default=1.0)
    p.add_argument("--mass", type=float, default=1.0)
    p.add_argument("--W", type=float, default=1.0)
    p.add_argument("--n_imp", type=float, default=0.05)
    p.add_argument("--Nt_list", type=int, nargs="+",
                   default=[2, 4, 6, 8, 12, 16, 24])
    p.add_argument("--n_sweeps", type=int, default=40)
    p.add_argument("--n_therm", type=int, default=20)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))

    import jax.numpy as jnp

    from dwavehmc_tpu import (
        LatticeSpec, hmc_sweep, init_chain_state, make_params,
    )

    if ns.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if ns.dtype == "float64" else jnp.float32

    lat = LatticeSpec(ns.L, ns.L)
    params = make_params(W=ns.W, n_imp=ns.n_imp, beta=ns.beta, J=ns.J,
                         mass=ns.mass, dtype=dtype)
    state0 = init_chain_state(lat, params, jax.random.PRNGKey(ns.seed),
                              dtype=dtype, n_imp=ns.n_imp)
    sweep = jax.jit(hmc_sweep, static_argnums=(0, 3))

    # fixed trajectory length: half the harmonic period (src ref :26-28)
    period = 4.0 * math.pi * math.sqrt(ns.mass * ns.J / ns.beta)
    length = period / 2.0

    print(f"trajectory length L={length:.4f} (T_period={period:.4f})")
    print(f"{'Nt':>4} {'dt':>9} {'acc':>6} {'eff=acc/Nt':>11}")
    best = (None, -1.0)
    for Nt in ns.Nt_list:
        dt = length / Nt
        state = state0
        for _ in range(ns.n_therm):
            state, _ = sweep(lat, params, state, Nt, dt)
        acc = 0
        for _ in range(ns.n_sweeps):
            state, info = sweep(lat, params, state, Nt, dt)
            acc += int(info.accepted)
        rate = acc / ns.n_sweeps
        eff = rate / Nt
        print(f"{Nt:>4} {dt:>9.5f} {rate:>6.2f} {eff:>11.4f}")
        if eff > best[1]:
            best = (Nt, eff)
    print(f"best Nt = {best[0]} (efficiency {best[1]:.4f})")


if __name__ == "__main__":
    main()
