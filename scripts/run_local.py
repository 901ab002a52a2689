#!/usr/bin/env python
"""Quick local run: clean 8×8 lattice, single β, short HMC chain — the
minimal end-to-end slice (BASELINE config 1; the reference's run_local.jl
is an empty stub, this one actually runs)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=8)
    p.add_argument("--beta", type=float, default=50.0)
    p.add_argument("--J", type=float, default=1.6)
    p.add_argument("--sweeps", type=int, default=30)
    p.add_argument("--out_dir", default="runs/local")
    p.add_argument("--dtype", default="float32")
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))

    from dwavehmc_tpu.drivers.simulation import run_simulation
    from dwavehmc_tpu.utils.config import RunConfig

    cfg = RunConfig(Lx=ns.L, Ly=ns.L, W=0.0, n_imp=0.0, beta=ns.beta,
                    J=ns.J, eta=0.1, domega=0.05, omega_max=2.0,
                    n_therm=10, n_measure=ns.sweeps, Nt_therm_init=10,
                    Nt_measure=6, measure_transport_freq=10, bin_size=2,
                    n_chains=1, dtype=ns.dtype, out_dir=ns.out_dir)
    summary = run_simulation(cfg)
    print(summary)


if __name__ == "__main__":
    main()
