"""Parameter-scan drivers: the production workloads.

Rebuilds scripts/batch_scan_T.jl / batch_scan_beta.jl two ways:

 * ``run_scan_serial`` — exact reference semantics: one full
   ``run_simulation`` (adaptive thermalization included) per grid point,
   each writing its own ``<prefix><value>/`` directory
   (scripts/batch_scan_T.jl:54-74).

 * ``run_scan_vectorized`` — the TPU-first flagship: every (grid point ×
   replica chain) is one row of a single vmapped ensemble with per-chain
   (β, dt), sharded over the device mesh, the whole measurement phase
   running as jit-compiled scans.  The reference's 24-point serial loop
   becomes one batched computation; outputs are sliced back into the same
   per-point directory layout so all post-processing tooling works
   unchanged.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.params import ModelParams
from ..parallel.ensemble import (
    ensemble_transport_jit,
    ensemble_transport_real_jit,
    init_ensemble,
    init_ensemble_real,
    make_mesh,
    run_segment_jit,
    run_segment_real_jit,
    shard_ensemble,
)
from ..sampler.hmc import calc_optimal_dt
from ..utils.config import RunConfig
from ..utils.io import (
    OBS_HEADER,
    TRANS_HEADER,
    CsvWriter,
    SpectraBinStore,
    TeeLogger,
    write_json,
)
from .simulation import run_simulation


def default_T_grid(n=24, lo=1e-4, hi=1e3) -> np.ndarray:
    """Log-spaced temperature grid (scripts/batch_scan_T.jl:10-27)."""
    return np.logspace(np.log10(lo), np.log10(hi), n)


def default_beta_grid(n=24, lo=0.01, hi=1e5) -> np.ndarray:
    """Log-spaced β grid (scripts/batch_scan_beta.jl:22-25)."""
    return np.logspace(np.log10(lo), np.log10(hi), n)


def run_scan_serial(cfg: RunConfig, values, *, scan_param: str = "T",
                    out_root: str | None = None) -> list[dict]:
    """One run_simulation per grid value.  ``scan_param``: "T" (β = 1/T)
    or any RunConfig field name (e.g. "beta", "J", "W")."""
    out_root = out_root or cfg.out_dir
    os.makedirs(out_root, exist_ok=True)
    results = []
    for v in values:
        sub = dataclasses.replace(cfg)
        if scan_param == "T":
            sub.beta = 1.0 / float(v)
        else:
            setattr(sub, scan_param, float(v))
        sub.out_dir = os.path.join(out_root, f"{scan_param}_{float(v):.6g}")
        results.append(run_simulation(sub))
    return results


def _broadcast_params(base: ModelParams, n: int, **per_chain) -> ModelParams:
    """ModelParams with every field broadcast to (n,); ``per_chain`` fields
    get explicit arrays."""
    fields = {}
    for name in base._fields:
        if name in per_chain:
            fields[name] = jnp.asarray(per_chain[name],
                                       dtype=getattr(base, name).dtype)
        else:
            fields[name] = jnp.broadcast_to(getattr(base, name), (n,))
    return ModelParams(**fields)


def adapt_dts(dts: np.ndarray, acc: np.ndarray, dt0: np.ndarray,
              lo: float = 0.60, hi: float = 0.95, shrink: float = 0.7,
              grow: float = 1.1, max_factor: float = 4.0) -> np.ndarray:
    """Per-chain step-size controller for the vectorized scan.

    The reference's thermalization controller retunes (Nt, dt) per point
    every 5 sweeps toward the 0.60–0.95 acceptance window
    (src/Simulation.jl:99-130).  Under a single jitted ensemble, Nt is a
    static loop bound shared by every chain, so the per-chain knob is dt
    (a traced array — adapting it re-jits nothing): acceptance below the
    window shrinks dt, above it grows dt (bounded by ``max_factor``·dt0)
    to trade surplus acceptance for longer trajectories.
    """
    dts = np.where(acc < lo, dts * shrink, dts)
    dts = np.where(acc > hi, np.minimum(dts * grow, dt0 * max_factor), dts)
    return dts


def run_scan_vectorized(cfg: RunConfig, values, *, scan_param: str = "T",
                        out_root: str | None = None,
                        replicas: int | None = None,
                        use_mesh: bool = True) -> dict:
    """Whole grid in one ensemble: chains = len(values) × replicas.

    Thermalizes with fixed ``Nt_therm_init`` and a per-chain adaptive dt
    (window-5 controller, see ``adapt_dts``; use run_scan_serial when the
    reference's exact Nt-retuning semantics matter), then measures with
    ``Nt_measure`` and the learned per-chain dt correction.  When the
    chain count is not a device multiple the ensemble is padded with
    throwaway chains so mesh sharding is never silently dropped.  Writes
    the same per-point directory layout as the serial scan.

    Resume (``cfg.resume``): ``scan_checkpoint.npz`` under the scan root
    holds the full ensemble state, the measurement sweep counter and the
    learned per-chain dt; a resumed run skips thermalization, preserves
    all CSV rows and spectra bins flushed up to the checkpoint, and
    continues the measurement loop.  Spectra accumulated after the last
    *completed* bin are not carried across the interruption — align
    ``checkpoint_freq`` to ``bin_size × measure_transport_freq`` for a
    loss-free resume.
    """
    out_root = out_root or cfg.out_dir
    os.makedirs(out_root, exist_ok=True)
    log = TeeLogger(os.path.join(out_root, "scan.log"), cfg.verbose)

    values = np.asarray([float(v) for v in values])
    G = len(values)
    C = replicas if replicas is not None else cfg.n_chains
    n_total = G * C
    lat = cfg.lattice()
    spec = cfg.spectral()
    dtype = cfg.jax_dtype()

    if scan_param == "T":
        betas = 1.0 / values
    elif scan_param == "beta":
        betas = values
    else:
        raise ValueError("vectorized scan supports scan_param in {'T','beta'}")
    beta_per_chain = np.repeat(betas, C)

    # pad to a device multiple so mesh sharding never gets dropped; the
    # padded chains recompute the last grid point and are discarded
    n_dev = len(jax.devices())
    n_pad = (-n_total) % n_dev if (use_mesh and n_dev > 1) else 0
    n_run = n_total + n_pad
    if n_pad:
        beta_per_chain = np.concatenate(
            [beta_per_chain, np.full(n_pad, beta_per_chain[-1])])
        log(f"Padding ensemble with {n_pad} throwaway chain(s) to reach a "
            f"multiple of {n_dev} devices ({n_total} -> {n_run}).")

    base = cfg.params()
    params = _broadcast_params(base, n_run, beta=beta_per_chain)

    log(f"Vectorized {scan_param}-scan: {G} points x {C} replicas = "
        f"{n_total} chains on {n_dev} device(s); "
        f"lattice {cfg.Lx}x{cfg.Ly}")

    path = cfg.resolved_path()
    if path == "real":
        if cfg.eigh_mode == "tracked":
            from ..parallel.ensemble import run_segment_tracked

            # Thermalization always anchors every sweep (exact Metropolis
            # spectra): cheap-anchor dH error grows as residual²/gap, and
            # far-from-equilibrium low-T chains have both large residuals
            # and tiny gaps — measured: a β=50 cold start at 24×24 stalls
            # at acceptance ~0.1 under K=10 cheap anchors at any Nt, but
            # thermalizes normally under exact anchors.  The user-chosen
            # cfg.anchor_every applies to measurement, where the bias
            # bound was validated on equilibrated states.
            def seg_fn(lt, p, s, n, Nt, dt, measure, pa, da,
                       anchor_every=None):
                return run_segment_tracked(lt, p, s, n, Nt, dt, measure,
                                           pa, da, cfg.tracked_iters,
                                           anchor_every
                                           if anchor_every is not None
                                           else cfg.anchor_every,
                                           cfg.refine_iters,
                                           cfg.polish_iters, 2,
                                           cfg.rot_jax_dtype())
        else:
            def seg_fn(lt, p, s, n, Nt, dt, measure, pa, da,
                       anchor_every=None):
                del anchor_every
                return run_segment_real_jit(lt, p, s, n, Nt, dt, measure,
                                            pa, da, cfg.eigh_mode)
        init_fn = init_ensemble_real
        transport_fn = ensemble_transport_real_jit
    else:
        def seg_fn(lt, p, s, n, Nt, dt, measure, pa, da, anchor_every=None):
            del anchor_every
            return run_segment_jit(lt, p, s, n, Nt, dt, measure, pa, da)
        init_fn = init_ensemble
        transport_fn = ensemble_transport_jit

    mesh = make_mesh() if (use_mesh and n_dev > 1) else None

    # --- resume: restore ensemble + measurement progress -----------------
    # (reference scans cannot resume at all — a crash loses the run,
    # SURVEY §5; the checkpoint holds the full ensemble state + the
    # learned per-chain measurement dt + the sweep counter)
    ckpt_path = os.path.join(out_root, "scan_checkpoint.npz")
    cfg_path = os.path.join(out_root, "scan_config.json")
    n_done0 = 0
    dt_m_saved = None
    if cfg.resume and os.path.exists(ckpt_path):
        import json as _json

        from ..utils.checkpoint import load_checkpoint
        ok = True
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                saved = _json.load(f)
            for k, want in (("values", values.tolist()), ("replicas", C),
                            ("Lx", cfg.Lx), ("Ly", cfg.Ly),
                            ("scan_param", scan_param)):
                if saved.get(k) != want:
                    log(f"Resume: scan_config mismatch on '{k}' — "
                        f"starting fresh.")
                    ok = False
                    break
        if ok:
            # base params suffice: rediagonalization needs only the
            # shared scalars (t, tp, mu) + the per-chain disorder that
            # lives in the checkpoint itself
            states, n_done0, extra = load_checkpoint(ckpt_path, lat, base,
                                                     state_path=path)
            dt_m_saved = extra.get("dt_m")
            log(f"Resumed scan at measurement sweep {n_done0} "
                f"from {ckpt_path}.")
    if n_done0 == 0:
        states = init_fn(lat, base, jax.random.PRNGKey(cfg.seed), n_run,
                         dtype=dtype, n_imp=cfg.n_imp)
    if mesh is not None:
        states = shard_ensemble(states, mesh)

    # --- thermalization: fixed Nt, per-chain adaptive dt ----------------
    # window-5 controller toward the reference's 0.60–0.95 acceptance
    # band (src/Simulation.jl:99-130), per-chain dt as the knob
    Nt_th = cfg.Nt_therm_init
    dt0 = np.asarray(
        [calc_optimal_dt(b, cfg.J, cfg.mass, Nt_th) for b in beta_per_chain])
    dts = dt0.copy()
    window = 5
    done = 0 if n_done0 == 0 else cfg.n_therm   # resumed: already thermal
    escalated = False
    while done < cfg.n_therm:
        n = min(window, cfg.n_therm - done)
        states, seg = seg_fn(lat, params, states, n, Nt_th,
                             jnp.asarray(dts, dtype=dtype), False, 0, 0,
                             anchor_every=1)
        done += n
        acc_chain = np.asarray(seg.accepted).mean(axis=0)   # (n_run,)
        # One-shot global Nt escalation after the probe window: the
        # reference's controller raises Nt per point whenever window
        # acceptance < 0.60 (src/Simulation.jl:116-120); under one
        # vmapped ensemble Nt is a static shape, so we escalate the
        # WHOLE ensemble once to the worst chain's need (over-
        # integration on easy chains costs compute, not correctness)
        # and recompute each chain's dt from the harmonic heuristic so
        # trajectory lengths are preserved.  Single extra compile.
        if cfg.Nt_escalate and not escalated:
            escalated = True
            need = np.where(acc_chain < 0.30, 2.0,
                            np.where(acc_chain < 0.60, 1.5, 1.0))
            Nt_new = int(np.ceil(Nt_th * float(need.max())))
            if Nt_new > Nt_th:
                log(f"Therm {done}/{cfg.n_therm}: min acc="
                    f"{acc_chain.min():.2f} -> escalating ensemble Nt "
                    f"{Nt_th} -> {Nt_new} (reference controller intent; "
                    f"one recompile)")
                Nt_th = Nt_new
                dt0 = np.asarray([calc_optimal_dt(b, cfg.J, cfg.mass,
                                                  Nt_th)
                                  for b in beta_per_chain])
                dts = dt0.copy()
                continue
        new_dts = adapt_dts(dts, acc_chain, dt0)
        n_adj = int(np.sum(new_dts != dts))
        if n_adj:
            log(f"Therm {done}/{cfg.n_therm}: mean acc="
                f"{acc_chain.mean():.2f}; adjusted dt on {n_adj} chain(s)")
        dts = new_dts
    if n_done0 == 0:
        log(f"Thermalization done ({cfg.n_therm} sweeps, Nt={Nt_th}), "
            f"mean acc={np.asarray(seg.accepted).mean():.2f}")

    # --- measurement ----------------------------------------------------
    # carry the learned per-chain dt correction factor into the
    # measurement step size (reference recomputes dt per phase from the
    # harmonic heuristic; the factor preserves the per-point tuning)
    Nt_m = cfg.Nt_measure
    factor = dts / dt0
    if dt_m_saved is not None:
        dt_m = jnp.asarray(dt_m_saved, dtype=dtype)
    else:
        dt_m = jnp.asarray(
            [calc_optimal_dt(b, cfg.J, cfg.mass, Nt_m) * f
             for b, f in zip(beta_per_chain, factor)],
            dtype=dtype)

    # per-point output channels
    dirs, f_obs, f_trans, stores = [], [], [], []
    for v in values:
        d = os.path.join(out_root, f"{scan_param}_{v:.6g}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
        header_o = OBS_HEADER if C == 1 else (
            "Sweep,Chain," + OBS_HEADER.split(",", 1)[1])
        header_t = TRANS_HEADER if C == 1 else (
            "Sweep,Chain," + TRANS_HEADER.split(",", 1)[1])
        res_at = n_done0 if n_done0 > 0 else None
        f_obs.append(CsvWriter(os.path.join(d, "observables.csv"), header_o,
                               resume_at=res_at))
        f_trans.append(CsvWriter(os.path.join(d, "transport.csv"), header_t,
                                 resume_at=res_at))
        stores.append(SpectraBinStore(
            os.path.join(d, "spectra_bins.npz"), cfg.bin_size,
            meta={"omega_grid": spec.omega_grid(),
                  "dos_grid": spec.dos_grid(), "Lx": cfg.Lx, "Ly": cfg.Ly,
                  scan_param: v, "eta": spec.eta, "n_chains": C},
            resume_at=res_at))
    write_json(os.path.join(out_root, "scan_config.json"),
               {**cfg.to_dict(), "scan_param": scan_param,
                "values": values.tolist(), "replicas": C})

    from ..utils.checkpoint import save_checkpoint

    freq = max(1, cfg.measure_transport_freq)
    n_done = n_done0
    while n_done < cfg.n_measure:
        n = min(freq, cfg.n_measure - n_done)
        states, seg = seg_fn(lat, params, states, n, Nt_m, dt_m,
                             True, 0, 0)
        acc = np.asarray(seg.accepted)
        dH = np.asarray(seg.dH)
        o = seg.observables
        cols = [np.asarray(x) for x in (
            o.total_energy, o.delta_amp, o.delta_local, o.delta_global,
            o.S_delta, o.hole_conc, o.delta_diff, o.delta_pair,
            o.delta_localpair)]
        for s in range(n):
            sweep = n_done + 1 + s
            for g in range(G):
                for c in range(C):
                    idx = g * C + c
                    row = [sweep] + ([c] if C > 1 else []) + \
                        [bool(acc[s, idx]), dH[s, idx]] + \
                        [col[s, idx] for col in cols]
                    f_obs[g].row(*row)
        n_done += n

        if n_done % freq == 0:
            res = transport_fn(lat, spec, params, states, 0)
            rho = np.asarray(res.superfluid_stiffness)
            dc = np.asarray(res.dc_conductivity)
            oc = np.asarray(res.optical_conductivity)
            dos = np.asarray(res.dos)
            dan = np.asarray(res.dos_AN)
            ak = np.asarray(res.A_k0)
            for g in range(G):
                sl = slice(g * C, (g + 1) * C)
                if C == 1:
                    f_trans[g].row(n_done, rho[g * C], dc[g * C])
                else:
                    for c in range(C):
                        f_trans[g].row(n_done, c, rho[g * C + c],
                                       dc[g * C + c])
                stores[g].add(n_done, {
                    "opt_cond": oc[sl], "dos": dos[sl],
                    "dos_AN": dan[sl], "A_k0": ak[sl]})
        if cfg.checkpoint_freq and (n_done % cfg.checkpoint_freq == 0
                                    or n_done >= cfg.n_measure):
            save_checkpoint(ckpt_path, states, n_done,
                            extra={"dt_m": np.asarray(dt_m)})
        if n_done % 10 == 0:
            log(f"Meas {n_done}/{cfg.n_measure}. "
                f"Acc={acc.mean():.2f}")

    for w in f_obs + f_trans:
        w.close()
    if cfg.n_measure % freq != 0:
        log(f"NOTE: final {cfg.n_measure % freq} sweep(s) had no transport "
            f"measurement (n_measure={cfg.n_measure} is not a multiple of "
            f"measure_transport_freq={freq}).")
    log("Scan done.")
    log.close()
    return {"dirs": dirs, "values": values.tolist(), "chains": n_total}
