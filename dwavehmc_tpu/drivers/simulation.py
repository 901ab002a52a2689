"""Simulation driver: adaptive thermalization + measurement loop + outputs.

Rebuild of run_simulation (src/Simulation.jl:34-236), restructured so the
device never waits on the host: sweeps run in jit-compiled *segments*
(lax.scan over the whole ensemble), the host only formats CSV rows and
accumulates spectra bins between segments.

Behavioral parity:
 * adaptive thermalization, window 5: acc < 0.60 ⇒ Nt += 2;
   acc > 0.95 and Nt > 4 ⇒ Nt −= 1; dt from the harmonic heuristic
   (src/Simulation.jl:99-130),
 * observables.csv / transport.csv with the reference's exact headers and
   one flushed row per sweep (src/Simulation.jl:71-73,161-177),
 * heavy measurement every ``measure_transport_freq`` sweeps, binned by
   ``bin_size`` into the spectra store (src/Simulation.jl:168-221),
 * plus checkpoint/resume — a new capability (SURVEY §5).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import numpy as np

from ..parallel.ensemble import (
    ensemble_transport_jit,
    ensemble_transport_real_jit,
    init_ensemble,
    init_ensemble_real,
    run_segment_jit,
    run_segment_real_jit,
)
from ..sampler.hmc import calc_optimal_dt
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.config import RunConfig
from ..utils.profiling import PhaseTimer, device_trace
from ..utils.io import (
    OBS_HEADER,
    TRANS_HEADER,
    CsvWriter,
    SpectraBinStore,
    TeeLogger,
    write_json,
)


def _obs_rows(writer: CsvWriter, start_sweep: int, seg, n_chains: int):
    """One CSV row per sweep (single chain) or per (sweep, chain)."""
    acc = np.asarray(seg.accepted)
    dH = np.asarray(seg.dH)
    o = seg.observables
    cols = [np.asarray(x) for x in (
        o.total_energy, o.delta_amp, o.delta_local, o.delta_global,
        o.S_delta, o.hole_conc, o.delta_diff, o.delta_pair, o.delta_localpair)]
    n_sweeps = acc.shape[0]
    for s in range(n_sweeps):
        sweep = start_sweep + s
        if n_chains == 1:
            writer.row(sweep, bool(acc[s, 0]), dH[s, 0],
                       *[c[s, 0] for c in cols])
        else:
            for c_idx in range(n_chains):
                writer.row(sweep, c_idx, bool(acc[s, c_idx]), dH[s, c_idx],
                           *[c[s, c_idx] for c in cols])


def run_simulation(cfg: RunConfig) -> dict:
    cfg.validate()
    lat = cfg.lattice()
    spec = cfg.spectral()
    params = cfg.params()
    dtype = cfg.jax_dtype()
    n_chains = cfg.n_chains
    path = cfg.resolved_path()

    if path == "real":
        if cfg.eigh_mode == "tracked" and cfg.metropolis_readout == "host":
            from ..parallel.ensemble import run_segment_hostacc

            # host-f64 Metropolis readout for β past the f32 wall
            # (ops/host_energy.py; same semantics as drivers/scan.py)
            host_cache: dict = {"c": None}

            def seg_fn(lt, p, s, n, Nt, dt, measure, pa,
                       anchor_every=None):
                del anchor_every   # host readout anchors every sweep
                s, res, host_cache["c"] = run_segment_hostacc(
                    lt, p, s, n, Nt, dt, measure=measure, params_axis=pa,
                    dt_axis=None, tracked_iters=cfg.tracked_iters,
                    ns_steps=cfg.resolved_ns_steps(), rot_dtype=cfg.rot_jax_dtype(),
                    exact_solver=cfg.exact_solver,
                    pot_cache=host_cache["c"],
                    rot_scheme=cfg.rot_scheme,
                    use_pallas_s=cfg.use_pallas_rot())
                return s, res
        elif cfg.eigh_mode == "tracked":
            # split runner: crash-safe on compilers that fault when the
            # exact embedding eigh shares a program with the tracked loop
            from ..parallel.ensemble import run_segment_tracked

            # Thermalization always anchors every sweep (exact Metropolis
            # spectra): cheap-anchor dH error ~ residual²/gap explodes on
            # cold low-T states — see drivers/scan.py for the measured
            # failure; cfg.anchor_every applies to measurement.
            def seg_fn(lt, p, s, n, Nt, dt, measure, pa,
                       anchor_every=None):
                return run_segment_tracked(lt, p, s, n, Nt, dt, measure,
                                           pa, None, cfg.tracked_iters,
                                           anchor_every
                                           if anchor_every is not None
                                           else cfg.anchor_every,
                                           cfg.refine_iters,
                                           cfg.polish_iters,
                                           cfg.resolved_ns_steps(),
                                           cfg.rot_jax_dtype(), 8,
                                           cfg.exact_solver,
                                           cfg.polish_precision,
                                           cfg.polish_correction,
                                           rot_scheme=cfg.rot_scheme,
                                           use_pallas_s=cfg.use_pallas_rot())
        else:
            def seg_fn(lt, p, s, n, Nt, dt, measure, pa,
                       anchor_every=None):
                del anchor_every
                return run_segment_real_jit(lt, p, s, n, Nt, dt, measure,
                                            pa, None, cfg.eigh_mode)
        init_fn = functools.partial(init_ensemble_real,
                                    exact_solver=cfg.exact_solver)
        transport_fn = ensemble_transport_real_jit
    else:
        def seg_fn(lt, p, s, n, Nt, dt, measure, pa, anchor_every=None):
            del anchor_every
            return run_segment_jit(lt, p, s, n, Nt, dt, measure, pa)
        init_fn = init_ensemble
        transport_fn = ensemble_transport_jit

    os.makedirs(cfg.out_dir, exist_ok=True)
    log = TeeLogger(os.path.join(cfg.out_dir, "simulation.log"), cfg.verbose)
    obs_header = OBS_HEADER if n_chains == 1 else (
        "Sweep,Chain," + OBS_HEADER.split(",", 1)[1])
    trans_header = TRANS_HEADER if n_chains == 1 else (
        "Sweep,Chain," + TRANS_HEADER.split(",", 1)[1])

    # resolve the resume point BEFORE opening any output channel so a
    # resumed run preserves every row/bin flushed up to the checkpoint
    ckpt_path = os.path.join(cfg.out_dir, "checkpoint.npz")
    start_sweep = 0
    ckpt_extra: dict = {}
    resumed = cfg.resume and os.path.exists(ckpt_path)
    if resumed:
        states, start_sweep, ckpt_extra = load_checkpoint(
            ckpt_path, lat, params, state_path=path)
    resume_at = start_sweep if resumed else None

    f_obs = CsvWriter(os.path.join(cfg.out_dir, "observables.csv"),
                      obs_header, resume_at=resume_at)
    f_trans = CsvWriter(os.path.join(cfg.out_dir, "transport.csv"),
                        trans_header, resume_at=resume_at)
    write_json(os.path.join(cfg.out_dir, "config.json"), cfg.to_dict())

    log("Starting Simulation (dwavehmc_tpu)...")
    log(f"System: {cfg.Lx}x{cfg.Ly}, beta={cfg.beta}, n_imp={cfg.n_imp}, "
        f"J={cfg.J}, chains={n_chains}, dtype={cfg.dtype}, "
        f"devices={len(jax.devices())}")
    log(f"Config: Therm={cfg.n_therm}, Sweep={cfg.n_measure}, "
        f"TransFreq={cfg.measure_transport_freq}, BinSize={cfg.bin_size}")

    spectra = SpectraBinStore(
        os.path.join(cfg.out_dir, "spectra_bins.npz"), cfg.bin_size,
        meta={"omega_grid": spec.omega_grid(), "dos_grid": spec.dos_grid(),
              "Lx": cfg.Lx, "Ly": cfg.Ly, "beta": cfg.beta, "J": cfg.J,
              "eta": spec.eta, "n_chains": n_chains},
        resume_at=resume_at)

    if resumed:
        spectra.load_state(ckpt_extra)
        log(f"Resumed from checkpoint at sweep {start_sweep} "
            f"(partial bin: {spectra.count}/{cfg.bin_size}).")
    else:
        log("Initializing State...")
        states = init_fn(lat, params, jax.random.PRNGKey(cfg.seed),
                         n_chains, dtype=dtype, n_imp=cfg.n_imp)

    # --- thermalization with the adaptive-Nt controller ----------------
    Nt = cfg.Nt_therm_init
    dt = calc_optimal_dt(cfg.beta, cfg.J, cfg.mass, Nt)
    window = 5
    log("--- Thermalization Start ---")
    log(f"Init: Nt={Nt}, dt={dt:.5f}")
    t0 = time.time()
    done = 0
    if start_sweep == 0:
        while done < cfg.n_therm:
            n = min(window, cfg.n_therm - done)
            states, seg = seg_fn(lat, params, states, n, Nt, dt,
                                 False, None, anchor_every=1)
            done += n
            rate = float(np.mean(np.asarray(seg.accepted)))
            old_Nt = Nt
            if rate < 0.60:
                Nt += 2
            elif rate > 0.95 and Nt > 4:
                Nt -= 1
            if Nt != old_Nt:
                dt = calc_optimal_dt(cfg.beta, cfg.J, cfg.mass, Nt)
                log(f"Therm {done}/{cfg.n_therm}. Rate={rate:.2f}. "
                    f"Adjust Nt: {old_Nt} -> {Nt}, dt: {dt:.4f}")
            elif done % 20 == 0:
                log(f"Therm {done}/{cfg.n_therm}. Rate={rate:.2f}. "
                    f"Nt={Nt} (Stable)")
        log(f"Thermalization Done. Time: {time.time()-t0:.2f}s")
    else:
        log("Skipping thermalization (resumed).")

    # --- measurement ----------------------------------------------------
    Nt_m = cfg.Nt_measure
    dt_m = calc_optimal_dt(cfg.beta, cfg.J, cfg.mass, Nt_m)
    log("--- Measurement Start ---")
    log(f"Settings: Nt={Nt_m}, dt={dt_m:.5f}")
    t0 = time.time()
    acc_total = 0.0
    n_done = start_sweep
    freq = max(1, cfg.measure_transport_freq)
    timer = PhaseTimer()
    trace_cm = device_trace(cfg.profile_dir)
    trace_cm.__enter__()

    while n_done < cfg.n_measure:
        n = min(freq, cfg.n_measure - n_done)
        with timer.span("hmc"):
            states, seg = seg_fn(lat, params, states, n, Nt_m, dt_m,
                                 True, None)
            jax.block_until_ready(jax.tree.leaves(states)[0])
        with timer.span("io"):
            _obs_rows(f_obs, n_done + 1, seg, n_chains)
        acc_total += float(np.sum(np.asarray(seg.accepted)))
        n_done += n

        if n_done % freq == 0:
            with timer.span("transport"):
                res = transport_fn(lat, spec, params, states)
            rho = np.asarray(res.superfluid_stiffness)
            dc = np.asarray(res.dc_conductivity)
            if n_chains == 1:
                f_trans.row(n_done, rho[0], dc[0])
            else:
                for c in range(n_chains):
                    f_trans.row(n_done, c, rho[c], dc[c])
            spectra.add(n_done, {
                "opt_cond": np.asarray(res.optical_conductivity),
                "dos": np.asarray(res.dos),
                "dos_AN": np.asarray(res.dos_AN),
                "A_k0": np.asarray(res.A_k0),
            })

        if cfg.checkpoint_freq and n_done % cfg.checkpoint_freq == 0:
            save_checkpoint(ckpt_path, states, n_done,
                            extra=spectra.state_dict())

        if n_done % 10 == 0:
            rate = acc_total / (max(1, n_done - start_sweep) * n_chains)
            e = float(np.mean(np.asarray(seg.observables.total_energy)))
            log(f"Meas {n_done}/{cfg.n_measure}. Acc={rate:.2f}. E={e:.4f}")

    trace_cm.__exit__(None, None, None)
    save_checkpoint(ckpt_path, states, n_done, extra=spectra.state_dict())
    if cfg.n_measure % freq != 0:
        log(f"NOTE: final {cfg.n_measure % freq} sweep(s) had no transport "
            f"measurement (n_measure={cfg.n_measure} is not a multiple of "
            f"measure_transport_freq={freq}).")
    log(f"Measurement Done. Total Time: {time.time()-t0:.2f}s "
        f"[{timer.summary()}]")
    log.close()
    f_obs.close()
    f_trans.close()

    return {
        "acceptance": acc_total / (max(1, n_done - start_sweep) * n_chains),
        "sweeps": n_done,
        "out_dir": cfg.out_dir,
    }
