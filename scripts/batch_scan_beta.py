#!/usr/bin/env python
"""β-scan workload on a clean(er) system (rebuild of scripts/batch_scan_beta.jl).

Reference shape (batch_scan_beta.jl:10-36): 12×12, W=1 with n_imp=0
(clean), J=0.8; 24 log-spaced β ∈ [0.01, 1e5].
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwavehmc_tpu.drivers.postprocess import summarize_scan
from dwavehmc_tpu.drivers.scan import (
    default_beta_grid,
    run_scan_serial,
    run_scan_vectorized,
)
from dwavehmc_tpu.utils.config import RunConfig, add_cli_args, from_namespace


def main():
    from dwavehmc_tpu.utils.quickcheck import run_quick_suite
    run_quick_suite()

    # env-gated multi-host init (DWAVEHMC_DISTRIBUTED=1 / coordinator env
    # vars) — must run before any device use; no-op single-process
    from dwavehmc_tpu.parallel.mesh import maybe_setup_distributed
    maybe_setup_distributed()

    defaults = RunConfig(
        Lx=12, Ly=12, W=1.0, n_imp=0.0, J=0.8,
        n_therm=20, n_measure=100, Nt_therm_init=20, Nt_measure=6,
        measure_transport_freq=1, bin_size=10,
        # the reference warm-starts every β point from the previous one
        # (benchmark_beta_scan.jl:66-87); the vectorized equivalent is the
        # geometric β-ladder ramp — on by default for this workload
        anneal_stages=10, anneal_sweeps=5, anneal_start_beta=100.0,
        out_dir="data/beta_scan")
    p = argparse.ArgumentParser(description=__doc__)
    add_cli_args(p, defaults)
    p.add_argument("--mode", choices=("vectorized", "serial"),
                   default="vectorized")
    p.add_argument("--n_beta", type=int, default=24)
    p.add_argument("--beta_min", type=float, default=0.01)
    p.add_argument("--beta_max", type=float, default=1e5)
    p.add_argument("--replicas", type=int, default=None)
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))
    cfg = from_namespace(ns)

    betas = default_beta_grid(ns.n_beta, ns.beta_min, ns.beta_max)
    if ns.mode == "vectorized":
        run_scan_vectorized(cfg, betas, scan_param="beta",
                            replicas=ns.replicas)
    else:
        run_scan_serial(cfg, betas, scan_param="beta")
    print("summary:", summarize_scan(cfg.out_dir, "beta_", "beta"))


if __name__ == "__main__":
    main()
