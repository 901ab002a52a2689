#!/usr/bin/env python
"""A/B the cheap-anchor endpoint-polish variants on hardware: wall time of
a tracked_fast segment vs paired |dH_cheap − dH_exact| bias, across
(polish_iters, polish_precision, polish_correction) configurations.

The endpoint polish is ~1/3 of a cheap sweep at 24×24/b64 (ROADMAP item:
polish tuning).  Two independent cost levers are measured here against the
r2-validated baseline (iters=4, precision="highest", no correction):

 * polish_precision="high": rotation matmuls at 3 MXU passes instead of 6
   (basis noise enters dH at second order; the readout stays "highest"),
 * polish_correction: the O(n²) second-order Rayleigh readout correction
   (ops/tracked_eigh.rayleigh_corrected_evals) in place of extra O(n³)
   rotations.

Writes examples/polish_ab.json.  Env knobs: AB_L (16), AB_BATCH (8),
AB_NT (6), AB_THERM (10), AB_PAIRED (6), AB_SWEEPS (20), AB_K (10),
AB_ROT (bfloat16).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


CONFIGS = [
    # (polish_iters, polish_precision, polish_correction)
    (4, "highest", False),   # r2-validated baseline
    (4, "high", False),      # cheaper rotations
    (2, "high", True),       # correction replaces 2 rotations
    (1, "high", True),
    (2, "highest", True),
    (0, "highest", True),    # correction only (refine-phase readout)
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
    from dwavehmc_tpu.parallel.ensemble import (
        _tracked_accept_jit,
        _tracked_leapfrog_jit,
        init_ensemble_real,
        run_segment_tracked,
    )

    L = int(os.environ.get("AB_L", 16))
    batch = int(os.environ.get("AB_BATCH", 8))
    Nt = int(os.environ.get("AB_NT", 6))
    therm = int(os.environ.get("AB_THERM", 10))
    paired = int(os.environ.get("AB_PAIRED", 6))
    sweeps = int(os.environ.get("AB_SWEEPS", 20))
    K = int(os.environ.get("AB_K", 10))
    rot_name = os.environ.get("AB_ROT", "bfloat16")
    rot = jnp.bfloat16 if rot_name == "bfloat16" else None
    beta, J, mass = 10.0, 0.8, 1.0
    refine_iters, tracked_iters = 12, 6

    lat = LatticeSpec(L, L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)
    dt = calc_optimal_dt(beta, J, mass, Nt)
    log(f"ab_polish: device={jax.devices()[0]} L={L} batch={batch} K={K} "
        f"rot={rot_name}")

    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                                dtype=jnp.float32, n_imp=0.05)
    states, seg = run_segment_tracked(lat, params, states, therm, 20,
                                      calc_optimal_dt(beta, J, mass, 20),
                                      False, None, None, tracked_iters)
    log(f"therm acc={float(np.mean(np.asarray(seg.accepted))):.2f}")

    results = []
    for p_iters, p_prec, p_corr in CONFIGS:
        tag = f"iters={p_iters} prec={p_prec} corr={p_corr}"
        # paired dH bias on identical proposals
        st = states
        errs = []
        for _ in range(paired):
            prop = _tracked_leapfrog_jit(lat, params, st, Nt, dt,
                                         tracked_iters, None, None,
                                         refine_iters, p_iters, 2, rot,
                                         p_prec, p_corr)
            _, info_cheap, _ = _tracked_accept_jit(lat, params, st, prop,
                                                   False, None, True)
            st, info_exact, _ = _tracked_accept_jit(lat, params, st, prop,
                                                    False, None, False)
            errs.append(np.abs(np.asarray(info_cheap.dH, np.float64)
                               - np.asarray(info_exact.dH, np.float64)))
        errs = np.concatenate(errs)

        # timed tracked_fast segment (warm + 2 timed reps, min)
        def seg_run(st):
            return run_segment_tracked(
                lat, params, st, sweeps, Nt, dt, False, None, None,
                tracked_iters, K, refine_iters, p_iters, 2, rot,
                polish_precision=p_prec, polish_correction=p_corr)

        st2, seg = seg_run(states)          # compile + warm
        _ = np.asarray(seg.accepted)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            st2, seg = seg_run(st2)
            acc = float(np.mean(np.asarray(seg.accepted)))
            times.append(time.perf_counter() - t0)
        t_best = min(times)
        row = {"polish_iters": p_iters, "polish_precision": p_prec,
               "polish_correction": p_corr,
               "max_dH_err": float(errs.max()),
               "mean_dH_err": float(errs.mean()),
               "traj_per_sec": round(batch * sweeps / t_best, 2),
               "acceptance": acc, "wall_s": round(t_best, 3)}
        results.append(row)
        log(f"{tag}: max|ddH|={row['max_dH_err']:.3e} "
            f"{row['traj_per_sec']} traj/s acc={acc:.3f}")

    out = {"config": {"L": L, "batch": batch, "Nt": Nt, "K": K,
                      "rot_dtype": rot_name, "refine_iters": refine_iters,
                      "sweeps": sweeps, "paired": paired},
           "device": str(jax.devices()[0]), "results": results}
    path = os.path.join(HERE, "examples", "polish_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    base = results[0]
    best = max(results, key=lambda r: (r["max_dH_err"] < 3e-3,
                                       r["traj_per_sec"]))
    print(json.dumps({"baseline_traj_per_sec": base["traj_per_sec"],
                      "best": best}))


if __name__ == "__main__":
    main()
