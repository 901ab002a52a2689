"""Headline benchmark: HMC trajectories/sec/chip at 16×16 (BASELINE.json metric).

Runs a batch of independent disordered 16×16 chains (2N = 512 BdG matrices)
in float32 on one chip, times jit-compiled measurement segments, and prints
ONE JSON line to stdout (progress goes to stderr).

Also reports a batched-eigh throughput figure (the second BASELINE metric)
and the mean acceptance rate (the third).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
anchor is an estimate of the reference's single-chain CPU throughput at the
same shape: MKL zheevd on a 512×512 complex Hermitian matrix ≈ 20 ms on a
modern many-core CPU, ×Nt=6 per trajectory plus O(N²) forces ⇒ ≈ 7
trajectories/sec.  (Documented estimate, not a measured number.)

Env knobs: BENCH_BATCH (default 8), BENCH_L (16), BENCH_NT (6),
BENCH_SWEEPS (20), BENCH_REPS (3), BENCH_SKIP_EIGH (0),
BENCH_ANCHOR_EVERY (10), BENCH_ROT_DTYPE (bfloat16|float32),
BENCH_EXACT_SOLVER (ph|qdwh — the anchor/init eigensolver; "ph" runs
the floor-guarded PH-split solver), BENCH_ROT_SCHEME (ns|exp2),
BENCH_PALLAS_S (1|0 — fused rotation-construction kernel),
BENCH_PRODUCTION (1|0 — the 24×24/b64 production-shape leg),
BENCH_CAPACITY (1|0 — the 32×32/b40 single-chip HBM-max anchor).

The emitted JSON carries the 16×16 headline (round-over-round
comparability) plus ``production_24x24`` and ``capacity_32x32`` legs —
the shapes the README's claims live at (VERDICT r4 item 4).

Defaults are the VALIDATED production config (bf16 in-trajectory
rotations + exact anchors every 10 sweeps): bias measured on-TPU at
max|dH_cheap−dH_exact| = 1.2e-3, equilibrium shift < 3e-4·SEM
(examples/cheap_anchor_validation_bf16.json).  Rotation scheme defaults
to "exp2" (U(I+S+S²/2), 1 Newton–Schulz): at 16×16/b8 it runs +48%
over "ns" at acceptance 0.93 (examples/rotation_ab_16x16.json), and at
24×24/b64 its endpoint algebra removes the cheap-endpoint readout
deficit the ns endpoint stalls at — paired dH bias 4.2 → 0.018 with
median segment dH −0.001 (honest reversible sampler) at 15.69 traj/s,
acc 0.953 (examples/rotation_ab_24x24_pass6_pc.json).  Endpoint trims
refine_iters=6 / polish_iters=3 (defaults) keep the paired bias at the
0.0165 floor with med_dH ~0 at +19.6% traj/s (18.77 at 24×24/b64,
examples/rotation_ab_24x24_pass9_refine.json); the production leg's
default dt_factor is 0.6, the NEG_DH_GUARD-compliant operating point
at this shape (full dt0 sits in the proposal-lag regime even for the
r4 ns baseline — pass 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache: repeat invocations skip the 30s+ eigh compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.parallel.ensemble import (
    init_ensemble,
    init_ensemble_real,
    run_segment_jit,
    run_segment_real_jit,
)

def reference_cpu_traj_per_sec(L: int, Nt: int) -> float:
    """Shape-aware estimate of the reference's single-chain CPU throughput:
    MKL zheevd ≈ 20 ms at 512² complex, scaling (2N/512)³, ×Nt per
    trajectory, +15% for forces/assembly.  (Documented estimate — the
    reference publishes no numbers, BASELINE.md.)"""
    dim = 2 * L * L
    eigh_s = 0.020 * (dim / 512.0) ** 3
    return 1.0 / (Nt * eigh_s * 1.15)


#: v5e MXU peak (bf16 multiply passes — the rate default-precision f32
#: matmuls execute at).  Documented constant for the MFU denominator.
V5E_BF16_PEAK_TFLOPS = 197.0


def tracked_model_flops(L: int, Nt: int, batch: int, n_sweeps: int,
                        tracked_iters: int, anchor_every: int,
                        refine_iters: int, polish_iters: int = 0,
                        ns_steps: int = 2, scheme: str = "ns") -> float:
    """Model FLOPs of the tracked-rotation matmul pipeline per segment
    (counts only the (2N)³ rotation matmuls — forces, eighs and VPU work
    excluded, so the resulting MFU slightly understates true utilization).

    Per tracked_step with the 3-mult complex algebra: project_T 6 +
    apply (U·S 3 for "ns"; S² + U·V = 6 for "exp2") + 6·ns_steps
    Newton–Schulz matmuls of 2n³ flops (n = 2L²), with ``ns_steps``
    applying to the in-trajectory rotations only — the endpoint refine
    phase always re-unitarizes at ns=2, and the polish runs 4-mult
    "highest" precision (8 project + 4/8 apply + 16 NS).
    """
    n = 2 * L * L
    mm = 2.0 * n**3
    apply_fast = 6 if scheme == "exp2" else 3
    per_iter = 6 + apply_fast + 6 * ns_steps
    per_step = per_iter * mm * tracked_iters
    refine_per = 6 + apply_fast + 12
    polish_per = 8 + (8 if scheme == "exp2" else 4) + 16
    cheap_extra = (refine_per * refine_iters
                   + polish_per * polish_iters) * mm
    n_anchor = (n_sweeps // anchor_every if anchor_every > 1 else n_sweeps)
    n_cheap = n_sweeps - n_anchor
    return batch * (n_sweeps * Nt * per_step + n_cheap * cheap_extra)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    batch = int(os.environ.get("BENCH_BATCH", 8))
    L = int(os.environ.get("BENCH_L", 16))
    Nt = int(os.environ.get("BENCH_NT", 6))
    sweeps = int(os.environ.get("BENCH_SWEEPS", 20))
    reps = int(os.environ.get("BENCH_REPS", 3))
    # "real" = complex-free real-symmetric-embedding path (TPU production —
    # the axon runtime executes real dtypes only); "complex" = c64 path.
    path = os.environ.get("BENCH_PATH", "real")

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:  # noqa: BLE001
        pass

    # fail-fast preflight: the tunneled worker can be down (observed
    # outage: registration succeeds but execution never returns, which
    # would hang the driver's bench run forever).  Probe device creation
    # + one tiny matmul in a watchdog thread; on deadline, emit a
    # diagnostic JSON line and exit nonzero.
    import threading

    preflight_s = float(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", 300))
    probe_out = {}

    def _probe():
        d = jax.devices()[0]
        x = jnp.ones((64, 64))
        probe_out["sum"] = float(np.asarray(x @ x)[0, 0])
        probe_out["dev"] = d

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(preflight_s)
    if th.is_alive() or "dev" not in probe_out:
        print(json.dumps({
            "metric": "hmc_trajectories_per_sec_per_chip",
            "value": 0.0, "unit": "traj/s", "vs_baseline": 0.0,
            "error": f"device preflight timed out after {preflight_s:.0f}s "
                     "(remote TPU worker unreachable)"}))
        os._exit(1)

    dev = probe_out["dev"]
    log(f"bench: device={dev} batch={batch} L={L} Nt={Nt} sweeps={sweeps} "
        f"path={path}")

    lat = LatticeSpec(L, L)
    beta, J, mass = 10.0, 0.8, 1.0
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)

    init_fn = init_ensemble_real if path == "real" else init_ensemble
    seg_fn = run_segment_real_jit if path == "real" else run_segment_jit

    t0 = time.perf_counter()
    states = init_fn(lat, params, jax.random.PRNGKey(0), batch,
                     dtype=jnp.float32, n_imp=0.05)
    _ = np.asarray(states.evals)   # true sync (block_until_ready can lie
    #                                on remote-execution backends)
    log(f"init+first eigh: {time.perf_counter()-t0:.1f}s")

    # secondary metric: batched eigh throughput (flops ≈ k·b·(2N)³ complex;
    # we report wall ms and an effective TFLOP/s with k=32 real flops/elem,
    # a standard QDWH-ish constant — documented, approximate)
    eigh_ms = None
    eigh_tflops = None
    eigh_ph_ms = None
    if os.environ.get("BENCH_SKIP_EIGH", "0") != "1":
        try:
            if path == "real":
                from dwavehmc_tpu.models.bdg_real import (
                    assemble_embedding, diagonalize_embedding,
                    static_embedding,
                )

                def batched_eigh(p, dre, dim_, disorder):
                    def one(dr, di, w):
                        Ms = static_embedding(lat, p.t, p.tp, p.mu, w)
                        return diagonalize_embedding(
                            assemble_embedding(lat, Ms, dr, di))[0]
                    return jax.vmap(one)(dre, dim_, disorder)

                f = jax.jit(batched_eigh)
                args = (params, states.delta_re, states.delta_im,
                        states.disorder)
                dim = 2 * lat.dim    # real embedding is 4N
                flop_k = 9           # real symmetric eigh ~ (4N)³·k
            else:
                from dwavehmc_tpu.models.bdg import (
                    assemble_bdg, static_hamiltonian,
                )

                def batched_eigh(p, delta, disorder):
                    def one(d, w):
                        Hs = static_hamiltonian(lat, p.t, p.tp, p.mu, w)
                        return jnp.linalg.eigh(assemble_bdg(lat, Hs, d))[0]
                    return jax.vmap(one)(delta, disorder)

                f = jax.jit(batched_eigh)
                args = (params, states.delta, states.disorder)
                dim = lat.dim
                flop_k = 32          # complex eigh ~ (2N)³·k real flops

            t0 = time.perf_counter()
            e = f(*args)
            _ = np.asarray(e)
            log(f"eigh compile+run: {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            n_eigh = 5
            for _ in range(n_eigh):
                e = f(*args)
            _ = np.asarray(e)
            eigh_ms = (time.perf_counter() - t0) / n_eigh * 1e3
            eigh_tflops = flop_k * batch * dim**3 / (eigh_ms * 1e-3) / 1e12
            log(f"batched eigh ({batch},{dim},{dim}): {eigh_ms:.2f} ms "
                f"(~{eigh_tflops:.2f} TFLOP/s effective)")

            # PH-split solver on the same problem (real path only): the
            # effective-TFLOP/s convention stays the QDWH one, so the
            # ratio is a true same-work speedup
            if path == "real":
                from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph

                def batched_eigh_ph(p, dre, dim_, disorder):
                    def one(dr, di, w):
                        Ms = static_embedding(lat, p.t, p.tp, p.mu, w)
                        return diagonalize_embedding_ph(
                            assemble_embedding(lat, Ms, dr, di))[0]
                    return jax.vmap(one)(dre, dim_, disorder)

                fp = jax.jit(batched_eigh_ph)
                e = fp(*args)
                _ = np.asarray(e)
                t0 = time.perf_counter()
                for _ in range(n_eigh):
                    e = fp(*args)
                _ = np.asarray(e)
                eigh_ph_ms = (time.perf_counter() - t0) / n_eigh * 1e3
                log(f"PH-split eigh ({batch},{dim},{dim}): "
                    f"{eigh_ph_ms:.2f} ms ({eigh_ms/eigh_ph_ms:.2f}x QDWH; "
                    f"~{flop_k*batch*dim**3/(eigh_ph_ms*1e-3)/1e12:.2f} "
                    f"TFLOP/s at same-work convention)")
        except Exception as e:  # noqa: BLE001 — sub-bench must not kill headline
            log(f"eigh sub-bench failed: {type(e).__name__}: {e}")

    def sync(seg):
        """True device sync: transfer the acceptance mask (tiny), which
        depends on the whole segment computation."""
        return np.asarray(seg.accepted)

    # --- thermalize (not timed): cold random starts have huge dH ---------
    # tracked split runner: works at every batch size (the exact-mode
    # eigh-inside-scan kernel-faults the worker at batch ≳ 32)
    from dwavehmc_tpu.parallel.ensemble import run_segment_tracked as _rst
    n_therm = int(os.environ.get("BENCH_THERM", 10))
    Nt_th = int(os.environ.get("BENCH_NT_THERM", 20))
    dt_th = calc_optimal_dt(beta, J, mass, Nt_th)
    t0 = time.perf_counter()
    if path == "real":
        states, seg = _rst(lat, params, states, n_therm, Nt_th, dt_th,
                           False, None, None, 6)
    else:
        states, seg = seg_fn(lat, params, states, n_therm, Nt_th, dt_th,
                             False, None)
    acc_th = float(np.mean(sync(seg)))
    log(f"therm ({n_therm} sweeps, Nt={Nt_th}): "
        f"{time.perf_counter()-t0:.1f}s acc={acc_th:.2f}")

    dt = calc_optimal_dt(beta, J, mass, Nt)

    results = {}
    modes = os.environ.get(
        "BENCH_MODES", "exact,tracked,tracked_fast").split(",") \
        if path == "real" else ["exact"]

    from dwavehmc_tpu.parallel.ensemble import run_segment_tracked

    def one_segment(mode, states):
        if path != "real":
            return seg_fn(lat, params, states, sweeps, Nt, dt, True, None)
        t_iters = int(os.environ.get("BENCH_TRACKED_ITERS", 6))
        scheme = os.environ.get("BENCH_ROT_SCHEME", "exp2")
        # exp2's validated pairing is a single Newton–Schulz step
        ns = int(os.environ.get("BENCH_NS_STEPS",
                                1 if scheme == "exp2" else 2))
        pal_s = os.environ.get("BENCH_PALLAS_S", "1") == "1"
        solver = os.environ.get("BENCH_EXACT_SOLVER", "ph")
        # BENCH_ROT_DTYPE=bfloat16: bf16-storage in-trajectory rotations
        rot = (jnp.bfloat16
               if os.environ.get("BENCH_ROT_DTYPE", "bfloat16") == "bfloat16" else None)
        if mode == "tracked":
            # split runner: the target compiler faults when the exact
            # embedding eigh shares a program with the tracked matmul loop
            return run_segment_tracked(lat, params, states, sweeps, Nt, dt,
                                       True, None, None, t_iters,
                                       ns_steps=ns, rot_dtype=rot,
                                       exact_solver=solver,
                                       rot_scheme=scheme,
                                       use_pallas_s=pal_s)
        if mode == "tracked_fast":
            # cheap anchors: exact eigh every 5th sweep; Metropolis uses the
            # refined+polished tracked endpoint spectrum in between
            return run_segment_tracked(
                lat, params, states, sweeps, Nt, dt, True, None, None,
                t_iters, int(os.environ.get("BENCH_ANCHOR_EVERY", 10)),
                int(os.environ.get("BENCH_REFINE_ITERS", 6)),
                int(os.environ.get("BENCH_POLISH_ITERS", 3)), ns, rot,
                exact_solver=solver,
                unroll=int(os.environ.get("BENCH_LEAPFROG_UNROLL", 1)),
                rot_scheme=scheme, use_pallas_s=pal_s)
        return seg_fn(lat, params, states, sweeps, Nt, dt, True, None,
                      None, mode)

    def run_mode(mode, states):
        t0 = time.perf_counter()
        states, seg = one_segment(mode, states)
        acc_arr = sync(seg)
        log(f"[{mode}] segment compile+run: {time.perf_counter()-t0:.1f}s")
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            states, seg = one_segment(mode, states)
            acc_arr = sync(seg)
            times.append(time.perf_counter() - t0)
            log(f"[{mode}] rep {r}: {times[-1]:.3f}s")
        best = min(times)
        out = {
            "traj_per_sec": batch * sweeps / best,
            "acceptance": float(np.mean(acc_arr)),
            "times_s": [round(t, 4) for t in times],
        }
        if mode.startswith("tracked"):
            t_iters = int(os.environ.get("BENCH_TRACKED_ITERS", 6))
            a_every = (int(os.environ.get("BENCH_ANCHOR_EVERY", 10))
                       if mode == "tracked_fast" else 1)
            r_iters = (int(os.environ.get("BENCH_REFINE_ITERS", 6))
                       if mode == "tracked_fast" else 0)
            p_iters = (int(os.environ.get("BENCH_POLISH_ITERS", 3))
                       if mode == "tracked_fast" else 0)
            scheme = os.environ.get("BENCH_ROT_SCHEME", "exp2")
            flops = tracked_model_flops(
                L, Nt, batch, sweeps, t_iters, a_every, r_iters, p_iters,
                int(os.environ.get("BENCH_NS_STEPS",
                                   1 if scheme == "exp2" else 2)), scheme)
            out["model_tflops"] = round(flops / best / 1e12, 2)
            out["mfu_pct"] = round(100 * flops / best / 1e12
                                   / V5E_BF16_PEAK_TFLOPS, 2)
            log(f"[{mode}] tracked-pipeline model rate: "
                f"{out['model_tflops']} TFLOP/s "
                f"({out['mfu_pct']}% of v5e bf16 peak)")
        return states, out

    for mode in modes:
        try:
            states, results[mode] = run_mode(mode, states)
        except Exception as e:  # noqa: BLE001 — a crashed mode must not
            #                     lose earlier modes' results
            log(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:120]}")
            break

    if not results:
        print(json.dumps({"metric": "bench_failed", "value": 0,
                          "unit": "traj/s", "vs_baseline": 0}))
        return

    # ---- production-shape legs (VERDICT r4 item 4): the shapes the
    # README's claims live at, driver-verified round over round ----------
    def shape_leg(Lp, bp, Ntp, n_sweeps, n_therm_p, reps_p, init_chunk,
                  eigh_bench, nt_therm=None):
        """One tracked_fast leg at (Lp, bp): init → short therm → timed
        segments (+ optional QDWH/PH eigh timing).  Production config
        knobs (K/refine/polish/rot/scheme) come from the same env as the
        headline."""
        from dwavehmc_tpu.models.bdg_real import (
            assemble_embedding, diagonalize_embedding, static_embedding,
        )
        from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph

        latp = LatticeSpec(Lp, Lp)
        pp = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)
        scheme = os.environ.get("BENCH_ROT_SCHEME", "exp2")
        ns = int(os.environ.get("BENCH_NS_STEPS",
                                1 if scheme == "exp2" else 2))
        pal_s = os.environ.get("BENCH_PALLAS_S", "1") == "1"
        solver = os.environ.get("BENCH_EXACT_SOLVER", "ph")
        rot = (jnp.bfloat16
               if os.environ.get("BENCH_ROT_DTYPE", "bfloat16")
               == "bfloat16" else None)
        K = int(os.environ.get("BENCH_ANCHOR_EVERY", 10))
        r_iters = int(os.environ.get("BENCH_REFINE_ITERS", 6))
        p_iters = int(os.environ.get("BENCH_POLISH_ITERS", 3))
        t_iters = int(os.environ.get("BENCH_TRACKED_ITERS", 6))

        t0 = time.perf_counter()
        st = init_fn(latp, pp, jax.random.PRNGKey(1), bp,
                     dtype=jnp.float32, n_imp=0.05,
                     exact_solver=solver, init_chunk=init_chunk)
        _ = np.asarray(st.evals)
        log(f"[{Lp}x{Lp}/b{bp}] init: {time.perf_counter()-t0:.1f}s")

        eigh = {}
        if eigh_bench:
            def batched(solver_fn):
                def f(p, dre, dim_, dis):
                    def one(dr, di, w):
                        Ms = static_embedding(latp, p.t, p.tp, p.mu, w)
                        return solver_fn(
                            assemble_embedding(latp, Ms, dr, di))[0]
                    return jax.vmap(one)(dre, dim_, dis)
                return jax.jit(f)
            args = (pp, st.delta_re, st.delta_im, st.disorder)
            dim = 4 * latp.n_sites
            for name, fn in (("qdwh", batched(diagonalize_embedding)),
                             ("ph", batched(diagonalize_embedding_ph))):
                e = fn(*args)
                _ = np.asarray(e)
                t0 = time.perf_counter()
                for _ in range(3):
                    e = fn(*args)
                _ = np.asarray(e)
                ms = (time.perf_counter() - t0) / 3 * 1e3
                eigh[f"eigh_{name}_ms"] = round(ms, 2)
                eigh[f"eigh_{name}_tflops_eff"] = round(
                    9 * bp * dim**3 / (ms * 1e-3) / 1e12, 2)
            # measured MXU roofline at THIS operand shape (bp, 2N, 2N) —
            # the honest MFU denominator: the chip's achievable chained
            # bf16 batched-matmul rate here sits well under the nominal
            # 197 TF/s peak, which only ~4096² shapes approach
            # (BENCH_LOCAL.json matmul_ceiling_24x24_b64: 89 TF/s)
            n2 = 2 * latp.n_sites
            x0 = (jax.random.normal(jax.random.PRNGKey(2), (bp, n2, n2),
                                    jnp.float32)
                  / np.sqrt(n2)).astype(jnp.bfloat16)
            n_mm = 30

            @jax.jit
            def mm_chain(x):
                def body(c, _):
                    return jnp.matmul(c, x).astype(jnp.bfloat16), None
                return jax.lax.scan(body, x, None, length=n_mm)[0]

            _ = np.asarray(mm_chain(x0)[0, 0, :2])     # compile
            t0 = time.perf_counter()
            _ = np.asarray(mm_chain(x0)[0, 0, :2])
            dtm = time.perf_counter() - t0
            eigh["matmul_ceiling_bf16_tflops"] = round(
                2 * bp * n2**3 * n_mm / dtm / 1e12, 3)
            log(f"[{Lp}x{Lp}/b{bp}] eigh: {eigh}")

        Nt_th = (nt_therm if nt_therm is not None
                 else int(os.environ.get("BENCH_NT_THERM", 20)))
        st, seg = _rst(latp, pp, st, n_therm_p, Nt_th,
                       calc_optimal_dt(beta, J, mass, Nt_th),
                       False, None, None, t_iters)
        _ = np.asarray(seg.accepted)
        dtp = (float(os.environ.get("BENCH_DT_FACTOR", 0.6))
               * calc_optimal_dt(beta, J, mass, Ntp))

        def seg_run(st):
            return run_segment_tracked(
                latp, pp, st, n_sweeps, Ntp, dtp, False, None, None,
                t_iters, K, r_iters, p_iters, ns, rot,
                exact_solver=solver, rot_scheme=scheme, use_pallas_s=pal_s)

        t0 = time.perf_counter()
        st, seg = seg_run(st)
        _ = np.asarray(seg.accepted)
        log(f"[{Lp}x{Lp}/b{bp}] segment compile+run: "
            f"{time.perf_counter()-t0:.1f}s")
        times = []
        dH_all = []
        for r in range(reps_p):
            t0 = time.perf_counter()
            st, seg = seg_run(st)
            acc = float(np.mean(np.asarray(seg.accepted)))
            dH_all.append(np.asarray(seg.dH, np.float64).ravel())
            times.append(time.perf_counter() - t0)
            log(f"[{Lp}x{Lp}/b{bp}] rep {r}: {times[-1]:.3f}s")
        best = min(times)
        dH_all = np.concatenate(dH_all)
        dH_fin = dH_all[np.isfinite(dH_all)]
        # reversibility diagnostic (drivers/scan.py NEG_DH_GUARD): median
        # dH < -0.5 marks the tracked-lag regime where raw traj/s
        # overstates honest sampling — reported, never hidden
        med_dH = float(np.median(dH_fin)) if dH_fin.size else None
        flops = tracked_model_flops(Lp, Ntp, bp, n_sweeps, t_iters, K,
                                    r_iters, p_iters, ns, scheme)
        leg = {"traj_per_sec": round(bp * n_sweeps / best, 3),
               "acceptance": round(acc, 3),
               "segment_med_dH": (None if med_dH is None
                                  else round(med_dH, 3)),
               "lag_bias_flag": bool(med_dH is not None and med_dH < -0.5),
               "effective_traj_per_sec": round(bp * n_sweeps / best * acc,
                                               3),
               "vs_baseline": round(bp * n_sweeps / best
                                    / reference_cpu_traj_per_sec(Lp, Ntp),
                                    2),
               "model_tflops": round(flops / best / 1e12, 2),
               "mfu_pct_nominal": round(100 * flops / best / 1e12
                                        / V5E_BF16_PEAK_TFLOPS, 2),
               # vs the MEASURED chained-matmul ceiling at this operand
               # shape — the roofline the pipeline can actually reach
               "mfu_pct_measured_ceiling": (
                   None if not eigh.get("matmul_ceiling_bf16_tflops")
                   else round(100 * flops / best / 1e12
                              / eigh["matmul_ceiling_bf16_tflops"], 1)),
               "config": {"Nt": Ntp, "sweeps": n_sweeps, "K": K,
                          "scheme": scheme, "ns_steps": ns,
                          "exact_solver": solver, "pallas_s": pal_s},
               **eigh}
        log(f"[{Lp}x{Lp}/b{bp}] {leg['traj_per_sec']} traj/s "
            f"acc={acc:.3f} {leg['model_tflops']} TF/s "
            f"({leg['mfu_pct_nominal']}% nominal)")
        return leg

    production = None
    if (path == "real"
            and os.environ.get("BENCH_PRODUCTION", "1") == "1"):
        try:
            production = shape_leg(int(os.environ.get("BENCH_PROD_L", 24)),
                                   int(os.environ.get("BENCH_PROD_B", 64)),
                                   6, n_sweeps=10, n_therm_p=6,
                                   reps_p=2, init_chunk=None,
                                   eigh_bench=True)
        except Exception as e:  # noqa: BLE001 — legs must not kill headline
            log(f"[production] FAILED: {type(e).__name__}: {str(e)[:200]}")
            production = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
    capacity = None
    if (path == "real"
            and os.environ.get("BENCH_CAPACITY", "1") == "1"):
        try:
            # 40 chains of 32×32 = the measured single-chip HBM maximum
            # (48 RESOURCE_EXHAUSTs; utils/memory.py model)
            # therm at Nt=6: a 20-step sweep at this shape is ~70
            # validated-step-equivalents — inside the ~90 s device
            # watchdog's danger zone (_watchdog_chunk_caps warns)
            capacity = shape_leg(int(os.environ.get("BENCH_CAP_L", 32)),
                                 int(os.environ.get("BENCH_CAP_B", 40)),
                                 6, n_sweeps=4, n_therm_p=2,
                                 reps_p=1, init_chunk=8, eigh_bench=False,
                                 nt_therm=6)
        except Exception as e:  # noqa: BLE001
            log(f"[capacity] FAILED: {type(e).__name__}: {str(e)[:200]}")
            capacity = {"error": f"{type(e).__name__}: {str(e)[:160]}"}

    # headline = best EFFECTIVE sampling rate (traj/s × acceptance):
    # raw throughput with collapsed acceptance is not progress
    best_mode = max(results, key=lambda m: (results[m]["traj_per_sec"]
                                            * results[m]["acceptance"]))
    r = results[best_mode]
    print(json.dumps({
        "metric": f"hmc_trajectories_per_sec_per_chip_{L}x{L}_b{batch}_Nt{Nt}",
        "value": round(r["traj_per_sec"], 3),
        "unit": "traj/s",
        "vs_baseline": round(r["traj_per_sec"]
                             / reference_cpu_traj_per_sec(L, Nt), 3),
        "baseline_note": ("vs documented CPU estimate "
                          "(reference publishes no numbers)"),
        "acceptance": round(r["acceptance"], 3),
        # traj/s × acceptance: the rate of ACCEPTED trajectories — the
        # number that actually measures sampling progress (the raw
        # headline value alone can drift up while acceptance drifts down)
        "effective_traj_per_sec": round(r["traj_per_sec"]
                                        * r["acceptance"], 3),
        "eigh_mode": best_mode,
        "modes": {m: {k2: v2 for k2, v2 in
                      (("traj_per_sec", round(v["traj_per_sec"], 3)),
                       ("acceptance", round(v["acceptance"], 3)),
                       ("model_tflops", v.get("model_tflops")),
                       ("mfu_pct", v.get("mfu_pct")))
                      if v2 is not None}
                  for m, v in results.items()},
        "eigh_ms": None if eigh_ms is None else round(eigh_ms, 3),
        "eigh_tflops_eff": None if eigh_tflops is None else round(eigh_tflops, 2),
        "eigh_ph_ms": None if eigh_ph_ms is None else round(eigh_ph_ms, 3),
        "eigh_ph_speedup": (None if (eigh_ph_ms is None or eigh_ms is None)
                            else round(eigh_ms / eigh_ph_ms, 2)),
        "production_24x24_b64": production,
        "capacity_32x32_b40": capacity,
        "device": str(dev),
        "times_s": r["times_s"],
    }))


if __name__ == "__main__":
    main()
