"""Memory estimator + end-to-end tooling smoke (plots from a real scan)."""

import os
import subprocess
import sys

import jax.numpy as jnp

from dwavehmc_tpu import LatticeSpec
from dwavehmc_tpu.utils.memory import estimate_memory, max_chains


def test_memory_estimate_scales():
    lat24 = LatticeSpec(24, 24)
    est = estimate_memory(lat24, 64, jnp.float32)
    # 2N=1152: evecs ~ 10.6 MiB; per-chain tens of MiB; 64 chains must fit
    # a 16 GiB v5e with headroom (the BASELINE.md target).
    assert est.fits(16 * 2**30)
    assert est.per_chain_bytes > est.state_bytes
    assert max_chains(lat24) >= 64

    lat32 = LatticeSpec(32, 32)
    assert estimate_memory(lat32, 1).per_chain_bytes > \
        estimate_memory(lat24, 1).per_chain_bytes


def test_plot_results_from_scan(tmp_path):
    """Full pipeline: vectorized scan → process → summarize → plots."""
    from dwavehmc_tpu.drivers.postprocess import (
        batch_process_spectra, summarize_scan,
    )
    from dwavehmc_tpu.drivers.scan import run_scan_vectorized
    from dwavehmc_tpu.utils.config import RunConfig

    root = str(tmp_path / "scan")
    cfg = RunConfig(Lx=4, Ly=4, W=0.5, n_imp=0.25, J=1.0,
                    eta=0.25, domega=0.25, omega_max=1.0,
                    n_therm=4, n_measure=4, Nt_therm_init=4, Nt_measure=4,
                    measure_transport_freq=2, bin_size=1, n_chains=1,
                    seed=1, dtype="float64", out_dir=root, verbose=False,
                    checkpoint_freq=0)
    run_scan_vectorized(cfg, [1.0, 4.0], scan_param="T", replicas=1)
    batch_process_spectra(root, "T_*")
    summarize_scan(root, "T_", "T")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "plot_results.py"),
         root], capture_output=True, text=True, env=env, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(root, "sigma_omega.png"))
    assert os.path.exists(os.path.join(root, "dos.png"))
    assert os.path.exists(os.path.join(root, "stiffness.png"))
    assert os.path.exists(os.path.join(root, "order_params.png"))
    # the power-law fit wrote its JSON (2 positive points suffice)
    assert os.path.exists(os.path.join(root, "powerlaw_fit.json"))


def test_fit_power_law_recovers_exponent():
    """Synthetic Δ_pair ~ a·T^b data must round-trip through the log-log
    fit (the plot_stiffness.ipynb analysis, SURVEY S20)."""
    import numpy as np
    import pytest

    from dwavehmc_tpu.drivers.postprocess import fit_power_law

    x = np.logspace(-3, 1, 12)
    a, b, n = fit_power_law(x, 2.5 * x**-1.7)
    assert n == 12
    assert abs(a - 2.5) < 1e-8
    assert abs(b + 1.7) < 1e-10

    # non-positive samples are excluded, not fatal
    y = 0.3 * x**0.5
    y[0] = 0.0
    y[3] = -1.0
    a, b, n = fit_power_law(x, y)
    assert n == 10
    assert abs(b - 0.5) < 1e-10

    with pytest.raises(ValueError):
        fit_power_law([1.0, 2.0], [0.0, -1.0])
