"""Scan-driver + post-processing tests: vectorized grid scan, per-point
output layout, spectra processing and summary aggregation (rebuilds of the
S1/S2/S5–S8 script suite as automated checks)."""

import glob
import os

import numpy as np

from dwavehmc_tpu.drivers.postprocess import (
    batch_process_spectra,
    process_spectra,
    summarize_scan,
)
from dwavehmc_tpu.drivers.scan import run_scan_serial, run_scan_vectorized
from dwavehmc_tpu.utils.config import RunConfig


def tiny_cfg(out_dir, **kw):
    base = dict(
        Lx=4, Ly=4, W=0.5, n_imp=0.25, J=1.0,
        eta=0.25, domega=0.25, omega_max=1.0,
        n_therm=6, n_measure=8, Nt_therm_init=5, Nt_measure=4,
        measure_transport_freq=2, bin_size=2,
        n_chains=2, seed=3, dtype="float64",
        out_dir=out_dir, verbose=False, checkpoint_freq=0,
    )
    base.update(kw)
    return RunConfig(**base)


def test_vectorized_T_scan_layout_and_postprocess(tmp_path):
    root = str(tmp_path / "scan")
    cfg = tiny_cfg(root)
    Ts = [0.5, 1.0, 2.0]
    out = run_scan_vectorized(cfg, Ts, scan_param="T", replicas=2)
    assert len(out["dirs"]) == 3
    assert out["chains"] == 6

    for d in out["dirs"]:
        assert os.path.exists(os.path.join(d, "observables.csv"))
        assert os.path.exists(os.path.join(d, "transport.csv"))
        assert os.path.exists(os.path.join(d, "spectra_bins.npz"))

    # spectra post-processing on one point
    info = process_spectra(out["dirs"][0])
    assert info["n_bins"] == 2   # 4 heavy measurements / bin_size 2
    for f in ("processed_opt_cond.csv", "processed_dos.csv",
              "processed_dos_AN.csv", "processed_ak0.csv"):
        assert os.path.exists(os.path.join(out["dirs"][0], f))

    # batch processing tolerates an invalid dir
    os.makedirs(os.path.join(root, "T_bogus"), exist_ok=True)
    res = batch_process_spectra(root, "T_*")
    assert len(res["processed"]) == 3
    assert len(res["failed"]) == 1

    # summary aggregation sorted by T
    summary = summarize_scan(root, "T_", "T")
    with open(summary) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 4
    header = lines[0].split(",")
    assert header[0] == "T"
    assert "Energy_mean" in header and "Superfluid_Stiffness_mean" in header
    Ts_sorted = [float(l.split(",")[0]) for l in lines[1:]]
    assert Ts_sorted == sorted(Ts_sorted)


def test_vectorized_beta_ordering_physics(tmp_path):
    """Colder chains (larger β) must show a coherent d-wave order parameter
    (Delta_Glob), hot chains only incoherent fluctuations — the physics the
    β-scan exists to show (scripts/batch_scan_beta.jl)."""
    root = str(tmp_path / "bscan")
    cfg = tiny_cfg(root, J=1.6, n_therm=25, n_measure=20,
                   measure_transport_freq=20, n_chains=1, W=0.0, n_imp=0.0)
    out = run_scan_vectorized(cfg, [0.5, 100.0], scan_param="beta",
                              replicas=1)
    pairs = []
    for d in out["dirs"]:
        with open(os.path.join(d, "observables.csv")) as f:
            rows = f.read().strip().split("\n")[1:]
        vals = [float(r.split(",")[10]) for r in rows]  # Delta_Pair column
        pairs.append(np.mean(vals[len(vals) // 2:]))
    assert pairs[1] > 0.1, pairs           # cold chain: ordered d-wave
    assert pairs[1] > 2 * pairs[0], pairs  # much larger than the hot chain


def test_serial_scan_dirs(tmp_path):
    root = str(tmp_path / "serial")
    cfg = tiny_cfg(root, n_chains=1, n_therm=3, n_measure=4,
                   measure_transport_freq=2, bin_size=1)
    res = run_scan_serial(cfg, [1.0, 2.0], scan_param="T", out_root=root)
    assert len(res) == 2
    assert os.path.isdir(os.path.join(root, "T_1"))
    assert os.path.isdir(os.path.join(root, "T_2"))

    # single-chain (n_chains=1) spectra must post-process cleanly: the
    # chain axis is pooled by ndim, not by meta n_chains (regression for
    # the (1, n_omega)-shaped mean crash)
    out = batch_process_spectra(root, "T_*")
    assert not out["failed"], out["failed"]
    assert len(out["processed"]) == 2
    with open(os.path.join(root, "T_1", "processed_dos.csv")) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) > 2
    for line in lines[1:]:
        assert np.isfinite(float(line.split(",")[1]))


def test_adapt_dts_controller():
    """Per-chain dt controller: shrink below the window, grow above it
    (capped), untouched inside (reference band 0.60-0.95,
    src/Simulation.jl:116-120)."""
    from dwavehmc_tpu.drivers.scan import adapt_dts

    dt0 = np.array([0.1, 0.1, 0.1, 0.1])
    dts = dt0.copy()
    acc = np.array([0.2, 0.7, 0.99, 0.99])
    out = adapt_dts(dts, acc, dt0)
    assert out[0] < dts[0]                  # too-low acceptance: shrink
    assert out[1] == dts[1]                 # in-window: untouched
    assert out[2] > dts[2]                  # too-high acceptance: grow
    # cap at max_factor * dt0
    big = adapt_dts(dt0 * 4.0, acc, dt0)
    assert big[3] == dt0[3] * 4.0

    # a chain stuck at acc=0 is FLOORED at min_factor*dt0, never collapses
    # to zero-length trajectories (VERDICT r2: unbounded shrinkage lets a
    # chain silently stop moving while acceptance looks perfect)
    from dwavehmc_tpu.drivers.scan import DT_MIN_FACTOR, chain_health

    d = dt0.copy()
    for _ in range(30):
        d = adapt_dts(d, np.zeros(4), dt0)
    assert np.all(d == dt0 * DT_MIN_FACTOR)
    # ...and chain_health flags exactly these floored-and-still-failing
    # chains, not a floored chain whose acceptance recovered
    bad = chain_health(d, np.array([0.0, 0.0, 0.7, 0.96]), dt0)
    assert bad.tolist() == [True, True, False, False]
    # a chain that accepted NOTHING in its last window is unhealthy
    # regardless of where its dt sits (VERDICT r3: β=1e4/1e5 sat at dt
    # factor 0.0625 — above the floor test — with zero accepts and
    # reported unhealthy_chains: 0)
    off_floor = chain_health(dt0 * 0.0625, np.array([0.0, 0.3, 0.7, 0.96]),
                             dt0)
    assert off_floor.tolist() == [True, False, False, False]


def test_adapt_dts_second_order():
    """With the window's median |dH| supplied, the controller uses the
    leapfrog law |dH| ~ dt^2 (hardware-measured: examples/
    beta_dt_probe.json) to jump toward the in-window dt instead of
    nudging 0.7x: a deep-cold chain at |dH| = 18 must shrink by the full
    0.25x trust bound in ONE window; the law only ever STRENGTHENS the
    shrink (min(f, 0.7)) so a below-window chain never shrinks slower
    than the first-order controller."""
    from dwavehmc_tpu.drivers.scan import adapt_dts

    dt0 = np.array([0.1, 0.1, 0.1])
    dts = dt0.copy()
    acc = np.array([0.05, 0.4, 0.8])
    dH = np.array([18.0, 0.9, 0.2])
    out = adapt_dts(dts, acc, dt0, med_absdH=dH)
    assert out[0] == dts[0] * 0.25            # trust-bounded full jump
    np.testing.assert_allclose(out[1], dts[1] * 0.7,
                               rtol=1e-6)     # law weaker than 0.7: nudge
    assert out[2] == dts[2]                   # in-window: untouched
    # law stronger than the nudge: sqrt(0.5/2.0) = 0.5 < 0.7 wins
    mid = adapt_dts(dts, acc, dt0,
                    med_absdH=np.array([2.0, 2.0, 2.0]))
    np.testing.assert_allclose(mid[0], dts[0] * 0.5, rtol=1e-6)
    # shrink never weaker than the first-order 0.7 nudge when below lo
    weak = adapt_dts(dts, np.array([0.1, 0.1, 0.1]), dt0,
                     med_absdH=np.array([0.6, 0.6, 0.6]))
    assert np.all(weak <= dts * 0.7 + 1e-12)


def test_nt_buckets_partition():
    """Probe-window acceptance partitions grid points into <=3 Nt buckets
    (per-point Nt retuning under jit's static-shape constraint; reference
    retunes Nt per point, src/Simulation.jl:116-120)."""
    from dwavehmc_tpu.drivers.scan import nt_buckets

    acc = np.array([0.9, 0.45, 0.1, 0.7, 0.05])
    b = nt_buckets(acc, 6)
    assert b == {6: [0, 3], 9: [1], 12: [2, 4]}
    # every point lands in exactly one bucket
    allpts = sorted(p for pts in b.values() for p in pts)
    assert allpts == list(range(5))
    # all-healthy grid: single bucket at the original Nt
    assert nt_buckets(np.full(3, 0.8), 6) == {6: [0, 1, 2]}


def test_vectorized_scan_pads_to_device_multiple(tmp_path):
    """3 points x 1 replica = 3 chains on 8 virtual devices: the ensemble
    must be padded to 8 (mesh kept) and outputs written only for the real
    chains."""
    root = str(tmp_path / "padscan")
    cfg = tiny_cfg(root, n_chains=1, n_therm=4, n_measure=4,
                   measure_transport_freq=2, bin_size=1)
    out = run_scan_vectorized(cfg, [0.5, 1.0, 2.0], scan_param="T",
                              replicas=1)
    assert out["chains"] == 3
    with open(os.path.join(root, "scan.log")) as f:
        logtxt = f.read()
    assert "Padding ensemble with 5 throwaway chain(s)" in logtxt
    for d in out["dirs"]:
        with open(os.path.join(d, "observables.csv")) as f:
            rows = f.read().strip().split("\n")
        assert len(rows) == 1 + 4          # header + 4 sweeps, 1 chain
    res = batch_process_spectra(root, "T_*")
    assert not res["failed"], res["failed"]


def test_vectorized_scan_resume_preserves_outputs(tmp_path):
    """A resumed scan must (a) skip thermalization, (b) preserve all
    pre-interruption CSV rows byte-identically, (c) keep earlier spectra
    bins, and (d) continue the measurement loop to the new n_measure.
    (The reference's scans cannot resume at all — SURVEY §5.)"""
    import dataclasses

    root = str(tmp_path / "resumescan")
    Ts = [0.5, 2.0]
    # phase 1: "interrupted" run — measures 4 of what will become 8
    # sweeps; checkpoint_freq=2 aligns with bin_size*freq for loss-free
    # bins
    cfg1 = tiny_cfg(root, n_therm=4, n_measure=4, measure_transport_freq=2,
                    bin_size=1, checkpoint_freq=2)
    run_scan_vectorized(cfg1, Ts, scan_param="T", replicas=2)
    assert os.path.exists(os.path.join(root, "scan_checkpoint.npz"))
    pre = {}
    for d in sorted(glob.glob(os.path.join(root, "T_*"))):
        with open(os.path.join(d, "observables.csv")) as f:
            pre[d] = f.read()

    # phase 2: resume to n_measure=8
    cfg2 = dataclasses.replace(cfg1, n_measure=8, resume=True)
    out = run_scan_vectorized(cfg2, Ts, scan_param="T", replicas=2)
    with open(os.path.join(root, "scan.log")) as f:
        logtxt = f.read()
    assert "Resumed scan at measurement sweep 4" in logtxt

    for d in out["dirs"]:
        with open(os.path.join(d, "observables.csv")) as f:
            txt = f.read()
        # pre-interruption rows byte-identical
        assert txt.startswith(pre[d]), d
        rows = txt.strip().split("\n")
        assert len(rows) == 1 + 8 * 2      # header + 8 sweeps x 2 chains
        # spectra bins: sweeps 2,4 (pre) + 6,8 (post) all present
        from dwavehmc_tpu.utils.io import SpectraBinStore
        _, bins = SpectraBinStore.load_bins(
            os.path.join(d, "spectra_bins.npz"))
        assert sorted(bins) == [2, 4, 6, 8], sorted(bins)

    # config mismatch -> fresh start, not a corrupt resume
    cfg3 = dataclasses.replace(cfg1, resume=True)
    run_scan_vectorized(cfg3, [0.5, 1.0, 2.0], scan_param="T", replicas=2)
    with open(os.path.join(root, "scan.log")) as f:
        logtxt = f.read()
    assert "scan_config mismatch" in logtxt


def test_nt_escalation_triggers_and_rescales_dt(tmp_path):
    """A grid point whose probe-window acceptance collapses must land in a
    higher-Nt bucket (per-point Nt retuning, reference controller intent
    src/Simulation.jl:116-120) while the easy point keeps the original Nt —
    nobody is over-integrated to the worst chain's need.  A per-point
    therm_health.json is emitted."""
    import json

    root = str(tmp_path / "escscan")
    # at Nt_therm_init=5 the hot point (T=5: large harmonic dt) probes at
    # acc ~0.4 and must escalate; the cold point probes near 1.0 and must
    # NOT be dragged along (measured differentiation on this seed)
    cfg = tiny_cfg(root, n_therm=10, n_measure=2, Nt_therm_init=5,
                   Nt_measure=3, measure_transport_freq=2, bin_size=1,
                   eigh_mode="tracked", anchor_every=2, dtype="float32",
                   path="real")
    run_scan_vectorized(cfg, [0.005, 5.0], scan_param="T", replicas=1)
    with open(os.path.join(root, "scan.log")) as f:
        logtxt = f.read()
    assert "Therm buckets (Nt -> #points)" in logtxt
    with open(os.path.join(root, "therm_health.json")) as f:
        health = json.load(f)
    assert set(health) == {"T_0.005", "T_5"}
    # hard point escalated beyond Nt=5, easy point untouched
    assert health["T_5"]["Nt_therm"] > 5
    assert health["T_0.005"]["Nt_therm"] == 5
    for h in health.values():
        assert 0.0 <= h["min_acc_last_window"] <= 1.0
        assert h["dt_factor_min"] > 0

    # with escalation disabled the Nt stays put (single bucket, no log)
    root2 = str(tmp_path / "noesc")
    import dataclasses
    cfg2 = dataclasses.replace(cfg, out_dir=root2, Nt_escalate=False)
    run_scan_vectorized(cfg2, [0.005, 5.0], scan_param="T", replicas=1)
    with open(os.path.join(root2, "scan.log")) as f:
        logtxt2 = f.read()
    assert "escalating" not in logtxt2
    assert "Therm buckets" not in logtxt2


def test_serial_scan_resume_skips_completed_points(tmp_path):
    """With cfg.resume, grid points whose checkpoint covers all n_measure
    sweeps are skipped outright (the reference's serial scan re-runs
    everything after a crash, scripts/batch_scan_T.jl:54-74)."""
    import dataclasses

    root = str(tmp_path / "serialresume")
    cfg = tiny_cfg(root, n_chains=1, n_therm=3, n_measure=4,
                   measure_transport_freq=2, bin_size=1, checkpoint_freq=2)
    run_scan_serial(cfg, [1.0], scan_param="T", out_root=root)   # point done
    mtime = os.path.getmtime(os.path.join(root, "T_1", "observables.csv"))

    cfg2 = dataclasses.replace(cfg, resume=True)
    res = run_scan_serial(cfg2, [1.0, 2.0], scan_param="T", out_root=root)
    assert res[0].get("skipped") is True            # finished: skipped
    assert "skipped" not in res[1]                  # new point: ran
    # the skipped point's outputs were not rewritten
    assert os.path.getmtime(
        os.path.join(root, "T_1", "observables.csv")) == mtime
    assert os.path.exists(os.path.join(root, "T_2", "observables.csv"))
    # without resume nothing is skipped
    res3 = run_scan_serial(cfg, [1.0], scan_param="T", out_root=root)
    assert "skipped" not in res3[0]


def test_vectorized_resume_preserves_partial_bins(tmp_path):
    """A checkpoint NOT aligned to bin boundaries must still lose no heavy
    measurements: the partial-bin accumulator rides the checkpoint's extra
    channel per point (ADVICE r2), like the serial driver."""
    import dataclasses

    from dwavehmc_tpu.utils.io import SpectraBinStore

    root = str(tmp_path / "binresume")
    Ts = [0.5, 2.0]
    # bin_size=2 with transport every sweep; checkpoint at sweep 3 holds
    # a HALF-FULL bin (measurement 3 of bin {3,4})
    cfg1 = tiny_cfg(root, n_therm=4, n_measure=3, measure_transport_freq=1,
                    bin_size=2, checkpoint_freq=3)
    run_scan_vectorized(cfg1, Ts, scan_param="T", replicas=2)

    cfg2 = dataclasses.replace(cfg1, n_measure=6, resume=True)
    out = run_scan_vectorized(cfg2, Ts, scan_param="T", replicas=2)
    for d in out["dirs"]:
        _, bins = SpectraBinStore.load_bins(
            os.path.join(d, "spectra_bins.npz"))
        # bins complete at sweeps 2 (pre), 4 (STRADDLES the checkpoint:
        # measurement 3 pre + 4 post), 6 (post) — nothing lost
        assert sorted(bins) == [2, 4, 6], sorted(bins)


def test_vectorized_anneal_warm_start(tmp_path):
    """β-ladder warm start (reference idiom: benchmark_beta_scan.jl:66-87
    carries the chain state up the β ladder).  anneal_stages>0 must (a)
    log the ramp, (b) leave warm points (β ≤ anneal_start_beta) unaffected
    in distribution, and (c) still produce the standard artifacts plus the
    measurement-phase health section."""
    root = str(tmp_path / "anneal")
    cfg = tiny_cfg(root, J=1.6, W=0.0, n_imp=0.0, n_chains=1,
                   n_therm=10, n_measure=6, measure_transport_freq=3,
                   bin_size=2, anneal_stages=3, anneal_sweeps=2,
                   anneal_start_beta=5.0)
    out = run_scan_vectorized(cfg, [0.5, 50.0], scan_param="beta",
                              replicas=2)
    with open(os.path.join(root, "scan.log")) as f:
        log_text = f.read()
    assert "Anneal stage 3/3" in log_text
    assert len(out["dirs"]) == 2

    # measurement-phase health recorded per point (VERDICT r3 weak 4)
    import json
    with open(os.path.join(root, "therm_health.json")) as f:
        health = json.load(f)
    for key in ("beta_0.5", "beta_50"):
        assert "measurement" in health[key], health.keys()
        m = health[key]["measurement"]
        assert 0.0 <= m["min_acc"] <= m["mean_acc"] <= 1.0
        assert m["sweeps"] == 6

    # cold point must order; the ramp must not break the physics
    with open(os.path.join(out["dirs"][1], "observables.csv")) as f:
        rows = f.read().strip().split("\n")[1:]
    pair = np.mean([float(r.split(",")[11]) for r in rows])
    assert pair > 0.1, pair


def test_anneal_ramp_is_noop_for_warm_points():
    """The geometric ramp formula: a chain with β_target ≤ anneal_start_beta
    runs its own target β at every stage."""
    beta_t = np.array([0.5, 5.0, 100.0, 1e5])
    b_origin = np.minimum(beta_t, 100.0)
    for k in range(1, 4):
        beta_k = b_origin * (beta_t / b_origin) ** (k / 3)
        # warm chains pinned at target
        np.testing.assert_allclose(beta_k[:3], beta_t[:3])
        # cold chain ramps monotonically toward target
        assert 100.0 < beta_k[3] <= 1e5 or k == 0
    np.testing.assert_allclose(
        b_origin * (beta_t / b_origin) ** (3 / 3), beta_t)


def test_adapt_dts_reversibility_guard():
    """Negative-median-dH guard (hardware finding, r4): the tracked
    leapfrog's warm-started basis makes the proposal map non-reversible
    once the tracking residual is large (the force at step i depends on
    the basis carried along the FORWARD path).  Measured: at 4x dt0 the
    8x8 tracked chain sits at acc=1.000 with median dH=-0.59 (97%
    negative) while the f64 exact path at the same dt is healthy
    (mean dH=+0.32, acc 0.74) — impossible for a reversible sampler at
    equilibrium (<e^-dH> = 1).  The acceptance-only controller then grows
    dt INTO the pathology.  Guard: median dH < -NEG_DH_GUARD shrinks dt
    even at perfect acceptance; growth is blocked below -NEG_DH_BLOCK."""
    from dwavehmc_tpu.drivers.scan import NEG_DH_GUARD, adapt_dts

    dt0 = np.array([0.1, 0.1, 0.1, 0.1])
    dts = dt0 * 2.0
    acc = np.ones(4)                            # acceptance pinned at 1.0
    med = np.array([-4.8, -0.2, +0.03, -0.6])   # 24x24 hot-point value...
    out = adapt_dts(dts, acc, dt0, med_dH=med)
    assert out[0] < dts[0]                      # deep bias: shrink
    assert out[1] == dts[1]                     # mild: no grow, no shrink
    assert out[2] > dts[2]                      # healthy: grow as usual
    assert out[3] < dts[3]                      # past guard: shrink
    assert med[3] < -NEG_DH_GUARD
    # without med_dH the old behavior is unchanged (grow at acc=1)
    legacy = adapt_dts(dt0.copy(), acc, dt0)
    assert np.all(legacy > dt0)


def test_tracked_negative_dH_pathology_detected(tmp_path):
    """End-to-end 4x4 regression: tracked f32 at 4x dt0 shows the
    signature (acc = 1.0 with systematically negative dH) that the guard
    exists to catch — if this stops reproducing, the guard thresholds
    should be revisited."""
    import jax
    import jax.numpy as jnp

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real,
        run_segment_tracked,
    )
    from dwavehmc_tpu.sampler.hmc import calc_optimal_dt

    lat = LatticeSpec(4, 4)
    beta, J = 1.1, 0.8
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.25,
                         beta=beta, J=J, mass=1.0, dtype=jnp.float32)
    st = init_ensemble_real(lat, params, jax.random.PRNGKey(0), 3,
                            dtype=jnp.float32, n_imp=0.25)
    Nt = 6
    dt0 = calc_optimal_dt(beta, J, 1.0, Nt)
    st, seg = run_segment_tracked(lat, params, st, 25, Nt, dt0 * 4.0,
                                  False, None, None, 6, anchor_every=1)
    dH = np.asarray(seg.dH)[10:]
    acc = np.asarray(seg.accepted)[10:]
    assert acc.mean() > 0.97, acc.mean()
    assert (dH < 0).mean() > 0.75, (dH < 0).mean()
    assert np.median(dH) < -0.05, np.median(dH)


def test_measurement_dt_never_carries_growth(tmp_path):
    """dt growth learned during anneal/therm (acc > 0.95 at Nt_therm) must
    NOT multiply the measurement step size: at fixed trajectory length the
    leapfrog error scales like factor³/Nt², so a factor tuned harmless at
    Nt_therm=20 carries ~11× the error at Nt_measure=6 (measured: a
    24-point β-scan whose therm grew factors to 2.2–3.1 collapsed to mean
    measurement acceptance 0.44 with med dH +1…+4.5).  The measurement dt
    carries only the learned SHRINK, then a pre-probe validates it at the
    measurement Nt before any row is recorded."""
    import json

    root = str(tmp_path / "growscan")
    # Nt_therm_init=20 ⇒ tiny therm step ⇒ acc ≈ 1 ⇒ the controller grows
    # dt every window (probe + bucket windows)
    cfg = tiny_cfg(root, n_therm=10, n_measure=4, Nt_therm_init=20,
                   Nt_measure=4, measure_transport_freq=2, bin_size=1,
                   meas_probe_sweeps=5)
    run_scan_vectorized(cfg, [0.5], scan_param="beta", replicas=2)
    with open(os.path.join(root, "therm_health.json")) as f:
        h = json.load(f)["beta_0.5"]
    assert h["dt_factor_min"] > 1.05, (
        "setup drift: therm no longer grows dt — the regression this test "
        f"guards is unreachable (factor {h['dt_factor_min']})")
    assert h["measurement"]["dt_factor_min"] <= 1.0 + 1e-6
    with open(os.path.join(root, "scan.log")) as f:
        assert "Meas probe" in f.read()


def test_adapt_dts_nonfinite_dH_takes_max_shrink():
    """A chain whose window median |dH| is non-finite (diverged leapfrog
    at huge harmonic dt — measured at T=1000, 24×24: dt0 ≈ 15 at Nt=6,
    non-finite dH in the measurement probe) must take the maximal
    trust-bounded shrink.  Before the guard, sqrt(target/nan) poisoned dt
    with nan and the chain was dead for the rest of the run
    (acc 0.00, dt_factor nan in therm_health)."""
    from dwavehmc_tpu.drivers.scan import adapt_dts

    dt0 = np.array([1.0, 1.0, 1.0])
    dts = dt0.copy()
    acc = np.array([0.0, 0.0, 1.0])
    med_abs = np.array([np.nan, np.inf, 0.1])
    med = np.array([np.nan, np.nan, 0.0])
    out = adapt_dts(dts, acc, dt0, med_absdH=med_abs, med_dH=med)
    assert np.isfinite(out).all()
    assert out[0] == 0.25 and out[1] == 0.25   # max trust-bounded shrink
    assert out[2] >= dts[2]                    # healthy chain unaffected
    # nan med_dH must also never unlock growth
    out2 = adapt_dts(np.ones(1), np.ones(1), np.ones(1),
                     med_dH=np.array([np.nan]))
    assert out2[0] == 1.0


def test_anneal_skipped_when_all_chains_warm(tmp_path):
    """An all-warm grid (every β ≤ anneal_start_beta) must skip the ramp
    phase entirely — it would be a multi-stage no-op in β (observed: a
    hot-side T-scan spent ~50 sweeps + a segment compile ramping nothing)."""
    root = str(tmp_path / "warmscan")
    cfg = tiny_cfg(root, n_therm=6, n_measure=2, anneal_stages=3,
                   anneal_sweeps=2, anneal_start_beta=100.0,
                   meas_probe_sweeps=0)
    run_scan_vectorized(cfg, [0.5, 2.0], scan_param="beta", replicas=1)
    with open(os.path.join(root, "scan.log")) as f:
        logtxt = f.read()
    assert "Annealing skipped" in logtxt
    assert "Anneal stage" not in logtxt

    root2 = str(tmp_path / "coldscan")
    import dataclasses
    cfg2 = dataclasses.replace(cfg, out_dir=root2)
    run_scan_vectorized(cfg2, [0.5, 500.0], scan_param="beta", replicas=1)
    with open(os.path.join(root2, "scan.log")) as f:
        assert "Anneal stage 3/3" in f.read()
