#!/usr/bin/env python
"""Probe the deep-cold (beta >= 1e4) acceptance collapse on the clean
12x12 lattice: is |dH| integrator error (scales ~dt^2) or an f32
conditioning floor (dt-independent)?

Runs exact-anchored tracked sweeps at dt0, dt0/2, dt0/4, dt0/8 on a
briefly-thermalized ensemble and prints mean|dH| per dt.
Writes examples/beta_dt_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    beta = float(os.environ.get("PROBE_BETA", 1e4))
    L = int(os.environ.get("PROBE_L", 12))
    b = int(os.environ.get("PROBE_B", 4))
    Nt = int(os.environ.get("PROBE_NT", 6))

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real, run_segment_tracked)
    from dwavehmc_tpu.sampler.hmc import calc_optimal_dt

    lat = LatticeSpec(L, L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.0,
                         beta=beta, J=0.8, mass=1.0, dtype=jnp.float32)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), b,
                                dtype=jnp.float32, n_imp=0.0)
    np.asarray(states.evals[..., :1])
    print("init done", file=sys.stderr)

    dt0 = calc_optimal_dt(beta, 0.8, 1.0, Nt)
    # short thermalization at shrunken dt so the probe states are not
    # pathological cold-start outliers (acceptance may still be ~0; the
    # dt-scaling conclusion is unaffected)
    dtv = jnp.full((b,), dt0 * 0.25, dtype=jnp.float32)
    states, seg = run_segment_tracked(lat, params, states, 10, 20, dtv,
                                      False, None, 0, 6, 1, 12, 4, 2, None)
    print(f"therm acc={float(np.mean(np.asarray(seg.accepted))):.2f}",
          file=sys.stderr)

    out = {"beta": beta, "L": L, "batch": b, "Nt": Nt, "dt0": float(dt0),
           "points": []}
    for scale in (1.0, 0.5, 0.25, 0.125):
        dtv = jnp.full((b,), dt0 * scale, dtype=jnp.float32)
        _, seg = run_segment_tracked(lat, params, states, 8, Nt, dtv,
                                     False, None, 0, 6, 1, 12, 4, 2, None)
        dH = np.asarray(seg.dH, dtype=np.float64)
        acc = float(np.mean(np.asarray(seg.accepted)))
        rec = {"dt_scale": scale, "mean_absdH": float(np.mean(np.abs(dH))),
               "med_absdH": float(np.median(np.abs(dH))), "acc": acc}
        out["points"].append(rec)
        print(rec, file=sys.stderr)

    p = out["points"]
    if p[0]["med_absdH"] > 0 and p[2]["med_absdH"] > 0:
        out["ratio_dt0_over_quarter"] = p[0]["med_absdH"] / p[2]["med_absdH"]
    with open("examples/beta_dt_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
