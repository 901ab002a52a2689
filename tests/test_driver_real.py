"""Driver on the real (complex-free) path: full output set + resume, and
per-sweep observable parity with the complex path under identical seeds."""

import csv
import os

import numpy as np

from dwavehmc_tpu.drivers.simulation import run_simulation
from dwavehmc_tpu.utils.config import RunConfig


def cfg_for(tmp_path, path, eigh_mode="exact", **kw):
    base = dict(
        Lx=4, Ly=4, W=0.5, n_imp=0.25, beta=5.0, J=1.0,
        eta=0.2, domega=0.2, omega_max=1.0,
        n_therm=6, n_measure=8, Nt_therm_init=6, Nt_measure=4,
        measure_transport_freq=4, bin_size=1,
        n_chains=2, seed=1, dtype="float64",
        out_dir=str(tmp_path / f"run_{path}_{eigh_mode}"), verbose=False,
        checkpoint_freq=4, path=path, eigh_mode=eigh_mode,
    )
    base.update(kw)
    return RunConfig(**base)


def read_rows(out_dir, fname="observables.csv"):
    with open(os.path.join(out_dir, fname)) as f:
        return list(csv.DictReader(f))


def test_real_driver_matches_complex_driver(tmp_path):
    """Same seeds ⇒ identical trajectories ⇒ identical CSV rows (to fp)."""
    r1 = run_simulation(cfg_for(tmp_path, "complex"))
    r2 = run_simulation(cfg_for(tmp_path, "real"))
    rows_c = read_rows(r1["out_dir"])
    rows_r = read_rows(r2["out_dir"])
    assert len(rows_c) == len(rows_r) == 8 * 2
    for a, b in zip(rows_c, rows_r):
        assert a["Accepted"] == b["Accepted"]
        np.testing.assert_allclose(float(b["Energy"]), float(a["Energy"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(b["Delta_Glob"]),
                                   float(a["Delta_Glob"]), rtol=1e-6,
                                   atol=1e-9)
    # transport rows too
    tc = read_rows(r1["out_dir"], "transport.csv")
    tr = read_rows(r2["out_dir"], "transport.csv")
    for a, b in zip(tc, tr):
        np.testing.assert_allclose(float(b["Superfluid_Stiffness"]),
                                   float(a["Superfluid_Stiffness"]),
                                   rtol=1e-5, atol=1e-8)


def test_real_driver_tracked_mode_runs(tmp_path):
    out = run_simulation(cfg_for(tmp_path, "real", eigh_mode="tracked"))
    rows = read_rows(out["out_dir"])
    assert len(rows) == 8 * 2
    assert all(np.isfinite(float(r["Energy"])) for r in rows)


def test_real_driver_resume(tmp_path):
    cfg_a = cfg_for(tmp_path, "real", n_measure=4, checkpoint_freq=4,
                    out_dir=str(tmp_path / "resume"))
    run_simulation(cfg_a)
    cfg_b = cfg_for(tmp_path, "real", n_measure=8, checkpoint_freq=4,
                    out_dir=str(tmp_path / "resume"), resume=True)
    run_simulation(cfg_b)
    ck = np.load(os.path.join(cfg_b.out_dir, "checkpoint.npz"))
    assert int(ck["sweep_idx"]) == 8
    assert np.iscomplexobj(ck["delta"])
