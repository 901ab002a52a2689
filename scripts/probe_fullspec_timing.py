#!/usr/bin/env python
"""One-off timing probe at the full-spec production shapes (24x24, b72,
full reference spectral grid) to size the T-scan run: per-sweep leapfrog,
exact-anchor eigh, and transport cost.  Not part of the test suite."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu.drivers.scan import _broadcast_params, default_T_grid
from dwavehmc_tpu.models.params import SpectralSpec
from dwavehmc_tpu.parallel.ensemble import (
    ensemble_transport_real_jit,
    init_ensemble_real,
    run_segment_tracked,
)
from dwavehmc_tpu.sampler.hmc import calc_optimal_dt
from dwavehmc_tpu.utils.config import RunConfig


def sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(leaf[..., :1])


def main():
    B = int(os.environ.get("PROBE_B", "72"))
    L = int(os.environ.get("PROBE_L", "24"))
    cfg = RunConfig(Lx=L, Ly=L, W=1.0, n_imp=0.05, J=0.8)
    lat = cfg.lattice()
    spec = cfg.spectral()
    print(f"probe: {L}x{L} b{B}, n_omega={spec.n_omega}", file=sys.stderr)

    Ts = default_T_grid(24, 1e-4, 1e3)
    betas = np.repeat(1.0 / Ts, B // 24)[:B]
    base = cfg.params()
    params = _broadcast_params(base, B, beta=betas)
    states = init_ensemble_real(lat, base, jax.random.PRNGKey(0), B,
                                dtype=jnp.float32, n_imp=cfg.n_imp)
    sync(states)
    print("init done", file=sys.stderr)

    for tag, Nt in (("therm Nt=20", 20), ("meas Nt=6", 6)):
        dts = jnp.asarray([calc_optimal_dt(b, 0.8, 1.0, Nt) for b in betas],
                          dtype=jnp.float32)
        for rep in range(2):
            t0 = time.time()
            states, seg = run_segment_tracked(lat, params, states, 1, Nt,
                                              dts, False, 0, 0, 6, 1, 12, 4,
                                              2, None)
            sync(states)
            dt_s = time.time() - t0
            acc = float(np.asarray(seg.accepted).mean())
            print(f"{tag} rep{rep}: {dt_s:.2f}s/sweep  acc={acc:.2f}",
                  file=sys.stderr)

    for rep in range(2):
        t0 = time.time()
        res = ensemble_transport_real_jit(lat, spec, params, states, 0)
        sync(res.superfluid_stiffness)
        print(f"transport rep{rep}: {time.time()-t0:.2f}s "
              f"rho[0]={float(np.asarray(res.superfluid_stiffness)[0]):.4f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
