#!/usr/bin/env python
"""Temperature-scan production workload (rebuild of scripts/batch_scan_T.jl).

Defaults mirror the reference's production shape (batch_scan_T.jl:10-36):
24×24 lattice, t=1, t'=−0.35, μ=−1.08, W=1, n_imp=0.05, J=0.8; 24
log-spaced T ∈ [1e−4, 1e3]; η=8/N, Δω=0.2η, ω_max=4; 20 therm + 100
measure sweeps, Nt_therm=20, Nt_meas=6, transport every sweep, bin 10.

Two modes: --mode vectorized (default; whole grid in one sharded ensemble)
or --mode serial (reference semantics: one adaptive run per point).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwavehmc_tpu.drivers.postprocess import summarize_scan
from dwavehmc_tpu.drivers.scan import (
    default_T_grid,
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
        Lx=24, Ly=24, W=1.0, n_imp=0.05, J=0.8,
        n_therm=20, n_measure=100, Nt_therm_init=20, Nt_measure=6,
        measure_transport_freq=1, bin_size=10,
        # β-ladder warm start for the cold tail (T ≤ 1e-2 ⇒ β ≥ 100):
        # deep-cold points must not cold-start (see batch_scan_beta.py)
        anneal_stages=10, anneal_sweeps=5, anneal_start_beta=100.0,
        out_dir="data/T_scan")
    p = argparse.ArgumentParser(description=__doc__)
    add_cli_args(p, defaults)
    p.add_argument("--mode", choices=("vectorized", "serial"),
                   default="vectorized")
    p.add_argument("--n_T", type=int, default=24)
    p.add_argument("--T_min", type=float, default=1e-4)
    p.add_argument("--T_max", type=float, default=1e3)
    p.add_argument("--replicas", type=int, default=None,
                   help="chains per T point (vectorized mode)")
    p.add_argument("--summarize", action=argparse.BooleanOptionalAction,
                   default=True)
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))
    cfg = from_namespace(ns)

    Ts = default_T_grid(ns.n_T, ns.T_min, ns.T_max)
    if ns.mode == "vectorized":
        run_scan_vectorized(cfg, Ts, scan_param="T", replicas=ns.replicas)
    else:
        run_scan_serial(cfg, Ts, scan_param="T")
    if ns.summarize:
        print("summary:", summarize_scan(cfg.out_dir, "T_", "T"))


if __name__ == "__main__":
    main()
