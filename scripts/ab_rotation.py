#!/usr/bin/env python
"""A/B the round-5 rotation-path variants on hardware at the production
shape: fused Pallas S-construction kernel, exp2 rotation scheme, and
guarded-PH anchors — against the r4-validated baseline (ns scheme, XLA
S-build, QDWH anchors).

Per variant: (a) paired |dH_cheap − dH_exact| bias on identical proposals
(the cheap-anchor exactness audit), (b) a timed tracked_fast segment
(traj/s + acceptance), (c) model TFLOP/s under that variant's matmul
count.  Decisions: ship a variant only if acceptance is unchanged within
noise and the dH bias stays at the validated ~1e-3 level.

Writes examples/rotation_ab_<L>x<L>.json.  Env knobs: AB_L (24),
AB_BATCH (64), AB_NT (6), AB_THERM (10), AB_PAIRED (3), AB_SWEEPS (10),
AB_K (10), AB_ROT (bfloat16), AB_VARIANTS (comma list to subset).
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


#: (tag, rot_scheme, ns_steps, use_pallas_s, exact_solver, overrides)
#: overrides: optional dict with tracked_iters / refine_iters /
#: polish_iters / polish_precision to probe iteration trims — exp2's
#: tighter per-iteration error may buy the same quality in fewer passes
VARIANTS = [
    ("baseline", "ns", 2, False, "qdwh", {}),   # r4 production config
    ("pallas", "ns", 2, True, "qdwh", {}),      # fused S kernel only
    ("exp2", "exp2", 1, True, "qdwh", {}),      # + exp2 rotation (1 NS)
    ("exp2_ph", "exp2", 1, True, "ph", {}),     # + guarded PH anchors
    ("exp2_ns0", "exp2", 0, True, "qdwh", {}),  # refuted: acc collapses
    # second-pass trims on top of exp2_ph:
    ("exp2_ph_t5", "exp2", 1, True, "ph", {"tracked_iters": 5}),
    ("exp2_ph_t4", "exp2", 1, True, "ph", {"tracked_iters": 4}),
    ("exp2_ph_r8", "exp2", 1, True, "ph", {"refine_iters": 8}),
    ("exp2_ph_hp", "exp2", 1, True, "ph", {"polish_precision": "high"}),
    # 24×24 pass 1 found exp2 loses acceptance at 2N=1152 (0.867 vs
    # 0.916) without a wall win — the orthogonal combination to probe is
    # ns scheme + kernel + guarded PH anchors, plus its trims:
    ("ns_ph", "ns", 2, True, "ph", {}),
    ("ns_ph_r8", "ns", 2, True, "ph", {"refine_iters": 8}),
    ("ns_ph_hp", "ns", 2, True, "ph", {"polish_precision": "high"}),
    ("ns_ph_t5", "ns", 2, True, "ph", {"tracked_iters": 5}),
    # pass 3: the pass-2 trims each won individually with equal-or-better
    # acceptance (r8 17.28@0.927, hp 17.36@0.948, t5 17.33@0.961 vs ns_ph
    # 16.09@0.920) — combine them, and probe one step further
    ("combo", "ns", 2, True, "ph",
     {"tracked_iters": 5, "refine_iters": 8, "polish_precision": "high"}),
    ("combo_t4", "ns", 2, True, "ph",
     {"tracked_iters": 4, "refine_iters": 8, "polish_precision": "high"}),
    ("combo_p3", "ns", 2, True, "ph",
     {"tracked_iters": 5, "refine_iters": 8, "polish_iters": 3,
      "polish_precision": "high"}),
    # pass 6: the cheap-endpoint readout deficit (Σ|T_ii| < Σ|E| by
    # ~0.14, i.e. ddH ~ +1.4 at β=10 — measured on the r4 BASELINE too,
    # so pre-existing at 24×24) is exactly the O(res²/gap) error the
    # Rayleigh correction removes; pc variants flip it on
    ("ns_ph_pc", "ns", 2, True, "ph", {"polish_correction": True}),
    ("ns_ph_pc_p6", "ns", 2, True, "ph",
     {"polish_correction": True, "polish_iters": 6}),
    ("exp2e_ph", "exp2", 1, True, "ph", {}),   # exp2 endpoint readout ref
    # pass 8: combine the two pass-7 honest winners (r8: +8.5% at
    # med_dH −0.003 / bias 0.017; hp: +8.8% at med_dH 0.0 / bias 0.103)
    # and probe one step past each — tracked_iters trims stay rejected
    # (t4: acc 0.99 with med_dH −0.20 = lag bias, pass 7)
    ("exp2_ph_r8hp", "exp2", 1, True, "ph",
     {"refine_iters": 8, "polish_precision": "high"}),
    ("exp2_ph_r8hp_p3", "exp2", 1, True, "ph",
     {"refine_iters": 8, "polish_iters": 3, "polish_precision": "high"}),
    ("exp2_ph_r6", "exp2", 1, True, "ph", {"refine_iters": 6}),
    # pass 9: the refine trim hits its bias floor fast under exp2 (r6
    # bias 0.017 = r12's) — probe deeper, and polish-count trims at
    # "highest" precision (hp's 0.1 bias sits AT the validation gate)
    ("exp2_ph_r4", "exp2", 1, True, "ph", {"refine_iters": 4}),
    ("exp2_ph_r6_p3", "exp2", 1, True, "ph",
     {"refine_iters": 6, "polish_iters": 3}),
    ("exp2_ph_r6hp_p3", "exp2", 1, True, "ph",
     {"refine_iters": 6, "polish_iters": 3, "polish_precision": "high"}),
]


def model_tflops(L, Nt, batch, n_sweeps, tracked_iters, anchor_every,
                 refine_iters, polish_iters, ns_steps, scheme):
    """Fast-path matmul count per tracked iteration: project 6 + apply
    (3 for ns / 6 for exp2 incl. S²) + 6·ns_steps Newton–Schulz; endpoint
    refine keeps ns=2 conventions (15/18 + 12... the refine/polish phases
    use the same scheme, refine at ns=2: 6+apply+12, polish 4-mult
    "highest": 8 + apply4 + 16)."""
    n = 2 * L * L
    mm = 2.0 * n**3
    apply_fast = 6 if scheme == "exp2" else 3
    per_iter = 6 + apply_fast + 6 * ns_steps
    per_step = per_iter * mm * tracked_iters
    refine_per = 6 + apply_fast + 12          # endpoint refine: ns=2
    apply_hp = 8 if scheme == "exp2" else 4   # 4-mult algebra
    polish_per = 8 + apply_hp + 16
    cheap_extra = (refine_per * refine_iters
                   + polish_per * polish_iters) * mm
    n_anchor = (n_sweeps // anchor_every if anchor_every > 1 else n_sweeps)
    n_cheap = n_sweeps - n_anchor
    return batch * (n_sweeps * Nt * per_step + n_cheap * cheap_extra)


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

    L = int(os.environ.get("AB_L", 24))
    batch = int(os.environ.get("AB_BATCH", 64))
    Nt = int(os.environ.get("AB_NT", 6))
    therm = int(os.environ.get("AB_THERM", 10))
    paired = int(os.environ.get("AB_PAIRED", 3))
    sweeps = int(os.environ.get("AB_SWEEPS", 10))
    K = int(os.environ.get("AB_K", 10))
    rot_name = os.environ.get("AB_ROT", "bfloat16")
    rot = jnp.bfloat16 if rot_name == "bfloat16" else None
    sel = os.environ.get("AB_VARIANTS")
    variants = [v for v in VARIANTS if sel is None or v[0] in sel.split(",")]
    if sel is not None:
        missing = set(sel.split(",")) - {v[0] for v in VARIANTS}
        assert not missing, f"unknown variants: {missing}"
    beta, J, mass = 10.0, 0.8, 1.0
    refine_iters, tracked_iters, polish_iters = 12, 6, 4

    lat = LatticeSpec(L, L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)
    # AB_DT_FACTOR: scale the harmonic-heuristic dt.  At 24×24 the
    # K=10 cheap-anchor mode at full dt0 sits in the proposal-lag regime
    # (segment med_dH ≤ −1.7, pass 4) — production scans are protected by
    # the dt controller's NEG_DH_GUARD, so honest variant comparisons
    # must run at a guard-compliant dt.
    dt_factor = float(os.environ.get("AB_DT_FACTOR", 1.0))
    dt = dt_factor * calc_optimal_dt(beta, J, mass, Nt)
    log(f"ab_rotation: device={jax.devices()[0]} L={L} batch={batch} "
        f"K={K} rot={rot_name} variants={[v[0] for v in variants]}")

    t0 = time.perf_counter()
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                                dtype=jnp.float32, n_imp=0.05)
    _ = np.asarray(states.evals)
    log(f"init: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    states, seg = run_segment_tracked(lat, params, states, therm, 20,
                                      calc_optimal_dt(beta, J, mass, 20),
                                      False, None, None, tracked_iters)
    log(f"therm {time.perf_counter()-t0:.1f}s "
        f"acc={float(np.mean(np.asarray(seg.accepted))):.2f}")

    results = []
    for tag, scheme, ns, pallas_s, solver, ov in variants:
        t_it = ov.get("tracked_iters", tracked_iters)
        r_it = ov.get("refine_iters", refine_iters)
        p_it = ov.get("polish_iters", polish_iters)
        p_prec = ov.get("polish_precision", "highest")
        p_corr = ov.get("polish_correction", False)
        try:
            # paired dH bias on identical proposals (cheap vs exact)
            st = states
            errs = []
            errs_nonfinite = 0
            t0 = time.perf_counter()
            for _ in range(paired):
                prop = _tracked_leapfrog_jit(
                    lat, params, st, Nt, dt, t_it, None, None,
                    r_it, p_it, ns, rot, p_prec, p_corr,
                    1, scheme, pallas_s)
                _, info_cheap, _ = _tracked_accept_jit(lat, params, st,
                                                       prop, False, None,
                                                       True)
                st, info_exact, _ = _tracked_accept_jit(lat, params, st,
                                                        prop, False, None,
                                                        False, solver)
                dc = np.asarray(info_cheap.dH, np.float64)
                de = np.asarray(info_exact.dH, np.float64)
                # a diverged proposal has non-finite dH on BOTH sides and
                # is rejected by both — not a bias; compare where both
                # are finite and count the rest
                both = np.isfinite(dc) & np.isfinite(de)
                errs.append(np.abs(dc[both] - de[both]))
                errs_nonfinite += int((~both).sum())
            errs = np.concatenate(errs)
            log(f"[{tag}] paired pass: {time.perf_counter()-t0:.1f}s "
                f"max|ddH|={errs.max():.3e} (nonfinite pairs "
                f"{errs_nonfinite})")

            def seg_run(st):
                return run_segment_tracked(
                    lat, params, st, sweeps, Nt, dt, False, None, None,
                    t_it, K, r_it, p_it, ns, rot,
                    exact_solver=solver, rot_scheme=scheme,
                    use_pallas_s=pallas_s, polish_precision=p_prec,
                    polish_correction=p_corr)

            t0 = time.perf_counter()
            st2, seg = seg_run(states)
            _ = np.asarray(seg.accepted)
            log(f"[{tag}] segment compile+run: {time.perf_counter()-t0:.1f}s")
            times = []
            dH_all = []
            for _ in range(2):
                t0 = time.perf_counter()
                st2, seg = seg_run(st2)
                acc = float(np.mean(np.asarray(seg.accepted)))
                dH_all.append(np.asarray(seg.dH, np.float64))
                times.append(time.perf_counter() - t0)
            t_best = min(times)
            dH_all = np.concatenate([d.ravel() for d in dH_all])
            dH_fin = dH_all[np.isfinite(dH_all)]
            # reversibility diagnostic (drivers/scan.py NEG_DH_GUARD): a
            # reversible proposal at equilibrium must have median dH >= ~0;
            # a trimmed tracked basis can LAG (non-reversible map), pinning
            # acceptance near 1 with median dH < 0 — raw traj/s with that
            # signature is bias, not speedup
            med_dH = float(np.median(dH_fin)) if dH_fin.size else None
            flops = model_tflops(L, Nt, batch, sweeps, t_it, K,
                                 r_it, p_it, ns, scheme)
            row = {"variant": tag, "rot_scheme": scheme, "ns_steps": ns,
                   "use_pallas_s": pallas_s, "exact_solver": solver,
                   **{k: v for k, v in ov.items()},
                   "max_dH_err": float(errs.max()),
                   "mean_dH_err": float(errs.mean()),
                   "paired_nonfinite": errs_nonfinite,
                   "traj_per_sec": round(batch * sweeps / t_best, 2),
                   "acceptance": round(acc, 4),
                   "segment_med_dH": (None if med_dH is None
                                      else round(med_dH, 4)),
                   "segment_mean_dH": (None if not dH_fin.size
                                       else round(float(dH_fin.mean()), 4)),
                   "lag_bias_flag": bool(med_dH is not None
                                         and med_dH < -0.5),
                   "model_tflops": round(flops / t_best / 1e12, 2),
                   "mfu_pct_nominal": round(flops / t_best / 1e12
                                            / 197.0 * 100, 2),
                   "wall_s": round(t_best, 3)}
            results.append(row)
            log(f"[{tag}] {row['traj_per_sec']} traj/s acc={acc:.3f} "
                f"med_dH={med_dH if med_dH is None else round(med_dH, 3)} "
                f"{row['model_tflops']} TF/s "
                f"({row['mfu_pct_nominal']}% nominal)")
        except Exception as e:  # noqa: BLE001 — one variant must not kill the A/B
            log(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            results.append({"variant": tag, "error":
                            f"{type(e).__name__}: {str(e)[:200]}"})

    out = {"config": {"L": L, "batch": batch, "Nt": Nt, "K": K,
                      "dt_factor": dt_factor,
                      "rot_dtype": rot_name, "refine_iters": refine_iters,
                      "polish_iters": polish_iters, "sweeps": sweeps,
                      "paired": paired},
           "device": str(jax.devices()[0]), "results": results}
    suffix = os.environ.get("AB_OUT_SUFFIX", "")
    suffix = f"_{suffix}" if suffix else ""
    path = os.path.join(HERE, "examples",
                        f"rotation_ab_{L}x{L}{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
