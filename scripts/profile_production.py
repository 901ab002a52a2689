#!/usr/bin/env python
"""Capture a jax.profiler device trace of the production 24x24/b64
tracked segment and report MEASURED utilization vs bench.py's model-FLOP
MFU (VERDICT r2 item 5: "profile, don't model").

Workflow: thermalize briefly, run one warm tracked_fast segment (compile
+ cache), then trace a second warm segment with jax.profiler; analyze
the chrome trace with scripts/analyze_trace.py machinery and write
examples/profile_production.json.

On this backend execution is remote (tunneled "axon" platform), so the
profiler may only see host-side tracks; the script records whatever
tracks exist and computes a wall-clock duty estimate either way.

Env knobs: PROF_L (24), PROF_BATCH (64), PROF_SWEEPS (20), PROF_NT (6),
PROF_ANCHOR_EVERY (10).
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real,
        run_segment_tracked,
    )

    L = int(os.environ.get("PROF_L", 24))
    batch = int(os.environ.get("PROF_BATCH", 64))
    sweeps = int(os.environ.get("PROF_SWEEPS", 20))
    Nt = int(os.environ.get("PROF_NT", 6))
    anchor_every = int(os.environ.get("PROF_ANCHOR_EVERY", 10))
    trace_dir = os.path.join(HERE, "examples", "trace_24x24_b64")

    lat = LatticeSpec(L, L)
    beta, J, mass = 10.0, 0.8, 1.0
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)
    dev = jax.devices()[0]
    log(f"profile_production: device={dev} L={L} batch={batch} "
        f"sweeps={sweeps} Nt={Nt} K={anchor_every}")

    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                                dtype=jnp.float32, n_imp=0.05)
    _ = np.asarray(states.evals[:, :2])
    log("init done")

    rot = jnp.bfloat16
    Nt_th = 20
    dt_th = calc_optimal_dt(beta, J, mass, Nt_th)
    states, seg = run_segment_tracked(lat, params, states, 6, Nt_th, dt_th,
                                      False, None, None, 6, anchor_every,
                                      12, 4, 2, rot)
    _ = np.asarray(seg.accepted)
    log("therm done")

    dt = calc_optimal_dt(beta, J, mass, Nt)

    def one_segment(states):
        return run_segment_tracked(lat, params, states, sweeps, Nt, dt,
                                   True, None, None, 6, anchor_every,
                                   12, 4, 2, rot)

    # warm run (compile)
    t0 = time.perf_counter()
    states, seg = one_segment(states)
    acc = float(np.mean(np.asarray(seg.accepted)))
    log(f"warm segment: {time.perf_counter()-t0:.1f}s acc={acc:.3f}")

    # timed un-traced warm run (baseline wall time)
    t0 = time.perf_counter()
    states, seg = one_segment(states)
    _ = np.asarray(seg.accepted)
    t_plain = time.perf_counter() - t0
    log(f"plain warm segment: {t_plain:.2f}s "
        f"({batch*sweeps/t_plain:.1f} traj/s)")

    # traced run
    trace_error = None
    t_traced = None
    try:
        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            states, seg = one_segment(states)
            _ = np.asarray(seg.accepted)
            t_traced = time.perf_counter() - t0
        log(f"traced segment: {t_traced:.2f}s -> {trace_dir}")
    except Exception as e:  # noqa: BLE001 — record, still emit timing report
        trace_error = f"{type(e).__name__}: {e}"
        log(f"profiler trace failed: {trace_error}")

    # analyze whatever trace files landed
    analyses = []
    if trace_error is None:
        import glob

        sys.path.insert(0, os.path.join(HERE, "scripts"))
        from analyze_trace import analyze

        paths = sorted(glob.glob(os.path.join(trace_dir, "**",
                                              "*.trace.json*"),
                                 recursive=True))
        log(f"trace files: {paths}")
        for p in paths:
            try:
                analyses.append(analyze(p, 12))
            except Exception as e:  # noqa: BLE001
                analyses.append({"file": p,
                                 "error": f"{type(e).__name__}: {e}"})

    # model-FLOP MFU for the same segment (bench.py convention)
    sys.path.insert(0, HERE)
    from bench import V5E_BF16_PEAK_TFLOPS, tracked_model_flops

    flops = tracked_model_flops(L, Nt, batch, sweeps, 6, anchor_every,
                                12, 4, 2)
    model_tflops = flops / t_plain / 1e12

    out = {
        "config": {"L": L, "batch": batch, "sweeps": sweeps, "Nt": Nt,
                   "anchor_every": anchor_every, "rot_dtype": "bfloat16"},
        "device": str(dev),
        "wall_s_plain": round(t_plain, 3),
        "wall_s_traced": round(t_traced, 3) if t_traced else None,
        "traj_per_sec": round(batch * sweeps / t_plain, 2),
        "acceptance": acc,
        "model_tflops": round(model_tflops, 2),
        "model_mfu_pct_nominal_peak": round(
            100 * model_tflops / V5E_BF16_PEAK_TFLOPS, 2),
        "trace_dir": os.path.relpath(trace_dir, HERE),
        "trace_error": trace_error,
        "track_analyses": analyses,
    }
    path = os.path.join(HERE, "examples", "profile_production.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps({"traj_per_sec": out["traj_per_sec"],
                      "acceptance": acc,
                      "model_tflops": out["model_tflops"],
                      "trace_ok": trace_error is None,
                      "n_track_analyses": len(analyses)}))


if __name__ == "__main__":
    main()
