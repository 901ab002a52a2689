#!/usr/bin/env python
"""32×32 lattice demonstration (BASELINE config 5, the largest target shape).

Runs a short disordered 32×32 HMC chain (2N = 2048, real embedding dim
4096) on one chip with the split tracked runner — the crash-safe
production path at this size (the exact eigh-inside-scan program faults
the target compiler at large shapes) — then one transport/spectra pass,
and records throughput + acceptance + transport observables to
``examples/demo_32x32.json``.

Reference production shape provenance: scripts/batch_scan_T.jl:10-36 uses
24×24; 32×32 is the driver-supplied BASELINE stretch config.  Physics
conventions per src/Observables.jl:344-425 (stiffness, σ(ω), DC).

Env knobs: DEMO_L (32), DEMO_BATCH (2), DEMO_THERM (8), DEMO_SWEEPS (10),
DEMO_NT (6), DEMO_ANCHOR_EVERY (5), DEMO_OMEGA_MAX (2.0).
"""

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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
    from dwavehmc_tpu.models.params import SpectralSpec
    from dwavehmc_tpu.parallel.ensemble import (
        ensemble_transport_real_jit,
        init_ensemble_real,
        run_segment_tracked,
    )

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:  # noqa: BLE001
        pass

    L = int(os.environ.get("DEMO_L", 32))
    batch = int(os.environ.get("DEMO_BATCH", 2))
    n_therm = int(os.environ.get("DEMO_THERM", 8))
    sweeps = int(os.environ.get("DEMO_SWEEPS", 10))
    Nt = int(os.environ.get("DEMO_NT", 6))
    anchor_every = int(os.environ.get("DEMO_ANCHOR_EVERY", 5))
    omega_max = float(os.environ.get("DEMO_OMEGA_MAX", 2.0))

    dev = jax.devices()[0]
    log(f"demo_32x32: device={dev} L={L} batch={batch} therm={n_therm} "
        f"sweeps={sweeps} Nt={Nt} K={anchor_every}")

    lat = LatticeSpec(L, L)
    beta, J, mass = 10.0, 0.8, 1.0
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)

    t0 = time.perf_counter()
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                                dtype=jnp.float32, n_imp=0.05)
    _ = np.asarray(states.evals[:, :2])      # true device sync
    t_init = time.perf_counter() - t0
    log(f"init+first exact eigh (dim {2 * lat.dim}): {t_init:.1f}s")

    # validated production numerics: bf16 in-trajectory rotations
    # (bias revalidated in examples/cheap_anchor_validation_bf16.json)
    rot = jnp.bfloat16 if os.environ.get(
        "DEMO_ROT_DTYPE", "bfloat16") == "bfloat16" else None

    # thermalize with the tracked runner (not timed for the headline)
    Nt_th = 20
    dt_th = calc_optimal_dt(beta, J, mass, Nt_th)
    t0 = time.perf_counter()
    states, seg = run_segment_tracked(lat, params, states, n_therm, Nt_th,
                                      dt_th, False, None, None, 6,
                                      anchor_every, 12, 6, 2, rot)
    acc_th = float(np.mean(np.asarray(seg.accepted)))
    t_therm = time.perf_counter() - t0
    log(f"therm ({n_therm} sweeps, Nt={Nt_th}): {t_therm:.1f}s acc={acc_th:.2f}")

    # measured segment
    dt = calc_optimal_dt(beta, J, mass, Nt)
    t0 = time.perf_counter()
    states, seg = run_segment_tracked(lat, params, states, sweeps, Nt, dt,
                                      True, None, None, 6, anchor_every,
                                      12, 6, 2, rot)
    acc = np.asarray(seg.accepted)
    t_first = time.perf_counter() - t0
    log(f"measure segment compile+run: {t_first:.1f}s "
        f"acc={float(np.mean(acc)):.2f}")
    t0 = time.perf_counter()
    states, seg = run_segment_tracked(lat, params, states, sweeps, Nt, dt,
                                      True, None, None, 6, anchor_every,
                                      12, 6, 2, rot)
    acc = np.asarray(seg.accepted)
    t_meas = time.perf_counter() - t0
    traj_per_sec = batch * sweeps / t_meas
    acceptance = float(np.mean(acc))
    energy = np.asarray(seg.observables.total_energy)
    delta_amp = np.asarray(seg.observables.delta_amp)
    log(f"measure segment (warm): {t_meas:.1f}s -> {traj_per_sec:.2f} traj/s "
        f"acc={acceptance:.2f}")

    # transport/spectra pass on the (exact-anchored) final eigenpairs
    spec = SpectralSpec(eta=8.0 / lat.n_sites, domega=0.02,
                        omega_max=omega_max)
    t0 = time.perf_counter()
    spectra = ensemble_transport_real_jit(lat, spec, params, states, None)
    rho_s = np.asarray(spectra.superfluid_stiffness)
    sigma_dc = np.asarray(spectra.dc_conductivity)
    t_trans = time.perf_counter() - t0
    log(f"transport pass: {t_trans:.1f}s rho_s={rho_s.tolist()} "
        f"sigma_dc={sigma_dc.tolist()}")

    out = {
        "config": {"L": L, "batch": batch, "beta": beta, "J": J, "Nt": Nt,
                   "anchor_every": anchor_every, "n_therm": n_therm,
                   "sweeps": sweeps, "bdg_dim": 2 * lat.n_sites,
                   "embedding_dim": 4 * lat.n_sites,
                   "eta": spec.eta, "domega": spec.domega,
                   "omega_max": omega_max},
        "device": str(dev),
        "timings_s": {"init_first_eigh": round(t_init, 1),
                      "therm": round(t_therm, 1),
                      "measure_warm": round(t_meas, 1),
                      "transport": round(t_trans, 1)},
        "traj_per_sec": round(traj_per_sec, 3),
        "acceptance": acceptance,
        "acceptance_therm": acc_th,
        "energy_mean": float(np.mean(energy)),
        "delta_amp_mean": float(np.mean(delta_amp)),
        "superfluid_stiffness": rho_s.tolist(),
        "dc_conductivity": sigma_dc.tolist(),
        "finite": bool(np.all(np.isfinite(energy))
                       and np.all(np.isfinite(rho_s))
                       and np.all(np.isfinite(sigma_dc))),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "demo_32x32.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps({"L": L, "traj_per_sec": out["traj_per_sec"],
                      "acceptance": acceptance,
                      "rho_s_mean": float(np.mean(rho_s)),
                      "finite": out["finite"]}))


if __name__ == "__main__":
    main()
