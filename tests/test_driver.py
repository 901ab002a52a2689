"""End-to-end driver test: tiny run producing the full output set
(rebuild of scripts/test_simulation.jl as an automated check), plus
checkpoint/resume determinism.
"""

import csv
import os

import numpy as np

from dwavehmc_tpu.drivers.simulation import run_simulation
from dwavehmc_tpu.utils.config import RunConfig
from dwavehmc_tpu.utils.io import SpectraBinStore


def small_cfg(tmp_path, **kw):
    base = dict(
        Lx=4, Ly=4, W=0.5, n_imp=0.25, beta=5.0, J=1.0,
        eta=0.2, domega=0.2, omega_max=1.0,
        n_therm=10, n_measure=12, Nt_therm_init=6, Nt_measure=4,
        measure_transport_freq=3, bin_size=2,
        n_chains=2, seed=1, dtype="float64",
        out_dir=str(tmp_path / "run"), verbose=False, checkpoint_freq=6,
    )
    base.update(kw)
    return RunConfig(**base)


def test_run_simulation_outputs(tmp_path):
    cfg = small_cfg(tmp_path)
    summary = run_simulation(cfg)
    out = cfg.out_dir

    for fname in ("simulation.log", "observables.csv", "transport.csv",
                  "spectra_bins.npz", "config.json", "checkpoint.npz"):
        assert os.path.exists(os.path.join(out, fname)), fname

    with open(os.path.join(out, "observables.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 12 * 2  # sweeps × chains
    assert set(rows[0]) == {"Sweep", "Chain", "Accepted", "dH", "Energy",
                            "Delta_Amp", "Delta_Loc", "Delta_Glob", "S_Delta",
                            "Hole_p", "Delta_Diff", "Delta_Pair",
                            "Delta_LocalPair"}
    for r in rows:
        assert np.isfinite(float(r["Energy"]))

    with open(os.path.join(out, "transport.csv")) as f:
        trows = list(csv.DictReader(f))
    assert len(trows) == 4 * 2  # every 3rd sweep × chains

    meta, bins = SpectraBinStore.load_bins(os.path.join(out, "spectra_bins.npz"))
    assert "omega_grid" in meta
    assert len(bins) == 2  # 4 heavy measurements / bin_size 2
    some = next(iter(bins.values()))
    assert {"opt_cond", "dos", "dos_AN", "A_k0", "count"} <= set(some)
    assert some["opt_cond"].shape[0] == 2  # chain axis
    assert 0.0 < summary["acceptance"] <= 1.0


def test_single_chain_reference_schema(tmp_path):
    cfg = small_cfg(tmp_path, n_chains=1, n_measure=5,
                    measure_transport_freq=2, out_dir=str(tmp_path / "r1"))
    run_simulation(cfg)
    with open(os.path.join(cfg.out_dir, "observables.csv")) as f:
        header = f.readline().strip()
    # exact reference header (src/Simulation.jl:71)
    assert header == ("Sweep,Accepted,dH,Energy,Delta_Amp,Delta_Loc,"
                      "Delta_Glob,S_Delta,Hole_p,Delta_Diff,Delta_Pair,"
                      "Delta_LocalPair")
    with open(os.path.join(cfg.out_dir, "transport.csv")) as f:
        header = f.readline().strip()
    assert header == "Sweep,Superfluid_Stiffness,DC_Conductivity"


def test_checkpoint_resume_continues_trajectory(tmp_path):
    """A run interrupted at sweep k and resumed must give the same chain
    state as the uninterrupted run (deterministic resume)."""
    cfg_full = small_cfg(tmp_path, n_chains=1, n_therm=4, n_measure=10,
                         measure_transport_freq=100, checkpoint_freq=5,
                         out_dir=str(tmp_path / "full"))
    run_simulation(cfg_full)

    # interrupted run: stop at 5, then resume to 10
    cfg_a = small_cfg(tmp_path, n_chains=1, n_therm=4, n_measure=5,
                      measure_transport_freq=100, checkpoint_freq=5,
                      out_dir=str(tmp_path / "split"))
    run_simulation(cfg_a)
    cfg_b = small_cfg(tmp_path, n_chains=1, n_therm=4, n_measure=10,
                      measure_transport_freq=100, checkpoint_freq=5,
                      out_dir=str(tmp_path / "split"), resume=True)
    run_simulation(cfg_b)

    a = np.load(os.path.join(cfg_full.out_dir, "checkpoint.npz"))
    b = np.load(os.path.join(cfg_b.out_dir, "checkpoint.npz"))
    assert int(a["sweep_idx"]) == int(b["sweep_idx"]) == 10
    np.testing.assert_allclose(a["delta"], b["delta"], atol=1e-12)
    np.testing.assert_array_equal(a["key"], b["key"])


def test_resume_preserves_prior_outputs(tmp_path):
    """Rows, transport entries, spectra bins, and the partial bin
    accumulator from before an interruption must survive a resume (the
    reference never loses flushed data, src/Simulation.jl:166,206-215)."""
    out = str(tmp_path / "dur")
    # transport every 2 sweeps, bin_size 2 ⇒ bins at sweeps 4, 8, ...;
    # checkpoint at 6 leaves a partial bin (the sweep-6 measurement)
    common = dict(n_chains=1, n_therm=2, n_measure=6,
                  measure_transport_freq=2, bin_size=2, checkpoint_freq=6,
                  out_dir=out)
    run_simulation(small_cfg(tmp_path, **common))

    with open(os.path.join(out, "observables.csv")) as f:
        rows_before = list(csv.DictReader(f))
    assert len(rows_before) == 6
    _, bins_before = SpectraBinStore.load_bins(
        os.path.join(out, "spectra_bins.npz"))
    assert sorted(bins_before) == [4]

    # resume to 12 sweeps
    run_simulation(small_cfg(tmp_path, **{**common, "n_measure": 12},
                             resume=True))

    with open(os.path.join(out, "observables.csv")) as f:
        rows_after = list(csv.DictReader(f))
    assert len(rows_after) == 12
    assert [int(r["Sweep"]) for r in rows_after] == list(range(1, 13))
    # pre-interruption rows are byte-identical (not recomputed)
    for rb, ra in zip(rows_before, rows_after[:6]):
        assert rb == ra

    with open(os.path.join(out, "transport.csv")) as f:
        trows = list(csv.DictReader(f))
    assert [int(r["Sweep"]) for r in trows] == [2, 4, 6, 8, 10, 12]

    _, bins_after = SpectraBinStore.load_bins(
        os.path.join(out, "spectra_bins.npz"))
    # the sweep-4 bin survived; the partial bin (sweep-6 measurement)
    # completed at sweep 8; sweep-12 bin flushed in the resumed run
    assert sorted(bins_after) == [4, 8, 12]
    np.testing.assert_array_equal(bins_after[4]["opt_cond"],
                                  bins_before[4]["opt_cond"])
    assert int(bins_after[8]["count"]) == 2
