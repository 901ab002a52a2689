#!/usr/bin/env python
"""Quantify the cheap-anchor Metropolis bias at production shape.

The tracked_fast mode (run_segment_tracked with anchor_every=K>1) skips
the exact embedding eigh on K−1 of K sweeps: Metropolis runs on the
high-precision-refined tracked endpoint spectrum instead.  Exactness of
the sampler (reference criterion: Metropolis on the true H,
src/HMC.jl:124-141) then rests on |dH_cheap − dH_exact| being negligible
against the O(1) Metropolis scale.  This script measures that error
directly on-device at a configurable shape (default: the 16×16 / batch-8
/ anchor_every-10 headline configuration):

 1. per-sweep paired comparison — the SAME proposal is scored by the
    cheap accept (tracked endpoint spectrum) and the exact accept
    (embedding eigh), recording |ΔdH| and the endpoint residual;
 2. equilibrium comparison — a cheap-anchored chain (K) vs an
    exact-anchored chain (K=1) from the same seed: energy, Δ_amp and
    acceptance must agree within combined statistical error.

Writes a JSON artifact (default examples/cheap_anchor_validation.json).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from dwavehmc_tpu.utils.quickcheck import run_quick_suite
    run_quick_suite()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beta", type=float, default=10.0)
    p.add_argument("--J", type=float, default=0.8)
    p.add_argument("--Nt", type=int, default=6)
    p.add_argument("--anchor_every", type=int, default=10)
    p.add_argument("--tracked_iters", type=int, default=6)
    p.add_argument("--refine_iters", type=int, default=12)
    p.add_argument("--polish_iters", type=int, default=6)
    p.add_argument("--polish_precision", default="highest",
                   choices=("highest", "high"),
                   help="matmul precision of the polish rotations (the "
                        "eigenvalue readout is always 'highest')")
    p.add_argument("--polish_correction", action="store_true",
                   help="second-order Rayleigh correction on the readout")
    p.add_argument("--rot_dtype", default=None, choices=(None, "bfloat16"),
                   help="storage dtype of the in-trajectory rotations")
    p.add_argument("--rot_scheme", default="exp2", choices=("ns", "exp2"),
                   help="tracked rotation application scheme")
    p.add_argument("--ns_steps", type=int, default=None,
                   help="Newton–Schulz steps (default: 1 for exp2, 2 for ns)")
    p.add_argument("--exact_solver", default="ph", choices=("qdwh", "ph"),
                   help="anchor/init exact eigensolver")
    p.add_argument("--use_pallas_s", type=int, default=None,
                   help="1|0: fused Pallas rotation-generator kernel "
                        "(default: on on TPU)")
    p.add_argument("--dt_factor", type=float, default=1.0,
                   help="scale the harmonic-heuristic dt (24×24 trims are "
                        "judged at 0.6 — the NEG_DH_GUARD-compliant point)")
    p.add_argument("--therm", type=int, default=10)
    p.add_argument("--paired", type=int, default=10,
                   help="number of paired cheap-vs-exact dH comparisons")
    p.add_argument("--sweeps", type=int, default=40,
                   help="equilibrium sweeps per mode")
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"))
    ns = p.parse_args()

    from dwavehmc_tpu.utils.platform import force_platform
    force_platform(ns.platform)

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

    lat = LatticeSpec(ns.L, ns.L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=ns.beta, J=ns.J, mass=1.0, dtype=jnp.float32)
    dt = ns.dt_factor * calc_optimal_dt(ns.beta, ns.J, 1.0, ns.Nt)
    rot = jnp.bfloat16 if ns.rot_dtype == "bfloat16" else None
    scheme = ns.rot_scheme
    nsteps = (ns.ns_steps if ns.ns_steps is not None
              else (1 if scheme == "exp2" else 2))
    if ns.use_pallas_s is None:
        from dwavehmc_tpu.ops.pallas_kernels import pallas_default
        pal_s = pallas_default()
    else:
        pal_s = bool(ns.use_pallas_s)
    log(f"device={jax.devices()[0]} L={ns.L} batch={ns.batch} "
        f"anchor_every={ns.anchor_every} refine_iters={ns.refine_iters} "
        f"polish_iters={ns.polish_iters} rot_dtype={ns.rot_dtype} "
        f"scheme={scheme} ns_steps={nsteps} solver={ns.exact_solver} "
        f"pallas_s={pal_s} dt_factor={ns.dt_factor}")

    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0),
                                ns.batch, dtype=jnp.float32, n_imp=0.05,
                                exact_solver=ns.exact_solver)

    t0 = time.time()
    states, seg = run_segment_tracked(lat, params, states, ns.therm, 20,
                                      calc_optimal_dt(ns.beta, ns.J, 1.0, 20),
                                      False, None, None, ns.tracked_iters)
    log(f"therm: {time.time()-t0:.1f}s acc={np.mean(np.asarray(seg.accepted)):.2f}")

    # --- 1. paired dH comparison on identical proposals -----------------
    dh_err, residuals, dh_scale = [], [], []
    n_diverged = 0
    states_c = states
    for i in range(ns.paired):
        prop = _tracked_leapfrog_jit(lat, params, states_c, ns.Nt, dt,
                                     ns.tracked_iters, None, None,
                                     ns.refine_iters, ns.polish_iters,
                                     nsteps, rot, ns.polish_precision,
                                     ns.polish_correction, 1, scheme, pal_s)
        _, info_cheap, _ = _tracked_accept_jit(lat, params, states_c, prop,
                                               False, None, True)
        states_c, info_exact, _ = _tracked_accept_jit(lat, params, states_c,
                                                      prop, False, None,
                                                      False, ns.exact_solver)
        dc = np.asarray(info_cheap.dH, dtype=np.float64)
        de = np.asarray(info_exact.dH, dtype=np.float64)
        res_end = np.asarray(prop[-1])
        # a diverged proposal (non-finite dH, or dH ≫ 0 on BOTH sides —
        # certain rejection either way) is decision-identical, not a
        # bias; the bias metric covers pairs where the Metropolis
        # decision could actually differ.  A pair where only ONE side
        # certainly rejects stays included and correctly fails the gate.
        both_fin = np.isfinite(dc) & np.isfinite(de)
        certain = both_fin & (dc > 50.0) & (de > 50.0)
        cmp = both_fin & ~certain
        n_diverged += int((~cmp).sum())
        dh_err.append(np.abs(dc[cmp] - de[cmp]))
        residuals.append(res_end[np.isfinite(res_end)])
        dh_scale.append(np.abs(de[cmp]))
        log(f"paired {i}: max|dH_cheap-dH_exact|="
            f"{np.max(dh_err[-1]) if dh_err[-1].size else float('nan'):.3e} "
            f"(excluded {int((~cmp).sum())} decision-identical diverged) "
            f"max res={np.max(residuals[-1]) if residuals[-1].size else float('nan'):.3e}")
    dh_err = np.concatenate(dh_err)
    residuals = np.concatenate(residuals)

    # --- 2. equilibrium comparison ---------------------------------------
    def run_chain(anchor_every):
        st = init_ensemble_real(lat, params, jax.random.PRNGKey(0),
                                ns.batch, dtype=jnp.float32, n_imp=0.05)
        st, _ = run_segment_tracked(lat, params, st, ns.therm, 20,
                                    calc_optimal_dt(ns.beta, ns.J, 1.0, 20),
                                    False, None, None, ns.tracked_iters)
        t0 = time.time()
        st, seg = run_segment_tracked(lat, params, st, ns.sweeps, ns.Nt, dt,
                                      True, None, None, ns.tracked_iters,
                                      anchor_every, ns.refine_iters,
                                      ns.polish_iters, nsteps, rot,
                                      polish_precision=ns.polish_precision,
                                      polish_correction=ns.polish_correction,
                                      exact_solver=ns.exact_solver,
                                      rot_scheme=scheme, use_pallas_s=pal_s)
        wall = time.time() - t0
        o = seg.observables
        half = ns.sweeps // 2
        take = lambda x: np.asarray(x, dtype=np.float64)[half:]  # noqa: E731
        stats = {}
        for name, arr in (("energy", take(o.total_energy)),
                          ("delta_amp", take(o.delta_amp)),
                          ("delta_pair", take(o.delta_pair))):
            stats[name] = {"mean": float(arr.mean()),
                           "sem": float(arr.std(ddof=1)
                                        / np.sqrt(arr.shape[0]))}
        stats["acceptance"] = float(np.mean(np.asarray(seg.accepted)))
        stats["traj_per_sec"] = ns.batch * ns.sweeps / wall
        return stats

    log("equilibrium: exact-anchored chain (K=1)...")
    exact_stats = run_chain(1)
    log(f"  {json.dumps(exact_stats['energy'])} acc={exact_stats['acceptance']:.2f}")
    log(f"equilibrium: cheap-anchored chain (K={ns.anchor_every})...")
    cheap_stats = run_chain(ns.anchor_every)
    log(f"  {json.dumps(cheap_stats['energy'])} acc={cheap_stats['acceptance']:.2f}")

    shifts = {}
    for name in ("energy", "delta_amp", "delta_pair"):
        d = abs(cheap_stats[name]["mean"] - exact_stats[name]["mean"])
        sem = (cheap_stats[name]["sem"]**2 + exact_stats[name]["sem"]**2)**0.5
        shifts[name] = {"abs_shift": d, "combined_sem": sem,
                        "shift_over_sem": d / max(sem, 1e-30)}

    out = {
        "config": {k: getattr(ns, k) for k in
                   ("L", "batch", "beta", "J", "Nt", "anchor_every",
                    "tracked_iters", "refine_iters", "polish_iters",
                    "polish_precision", "polish_correction", "therm",
                    "paired", "sweeps", "rot_dtype", "rot_scheme",
                    "exact_solver", "dt_factor")},
        "ns_steps": nsteps, "use_pallas_s": pal_s,
        "device": str(jax.devices()[0]),
        "paired_dH": {
            "max_abs_err": float(dh_err.max()),
            "mean_abs_err": float(dh_err.mean()),
            "max_endpoint_residual": float(residuals.max()),
            "n_samples": int(dh_err.size),
            "n_diverged_decision_identical": int(n_diverged),
        },
        "equilibrium": {"exact": exact_stats, "cheap": cheap_stats,
                        "shifts": shifts},
        "pass": bool(dh_err.max() < 0.1
                     and all(s["shift_over_sem"] < 3.0
                             for s in shifts.values())),
    }
    path = ns.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "cheap_anchor_validation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps({"pass": out["pass"],
                      "max_dH_err": out["paired_dH"]["max_abs_err"],
                      "max_shift_over_sem": max(
                          s["shift_over_sem"] for s in shifts.values())}))


if __name__ == "__main__":
    main()
