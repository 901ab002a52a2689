#!/usr/bin/env python
"""Production-shape spectra parity artifact (VERDICT r4 item 5).

Takes the flagship T-scan's checkpointed final states at T = 0.0135031
(mid-transition; examples/T_scan_full_24x24/scan_checkpoint.npz, chains
21-23 of the point-major 24×3 layout) and computes the FULL transport/
spectra suite twice from the SAME state:

 * production numerics — float32 real-pair path: real-symmetric-embedding
   QDWH eigh, real-pair matrix elements, Pallas σ(ω)/DC kernel (interpret
   mode on CPU executes the identical f32 tile math the TPU kernel runs),
 * oracle numerics — complex128 BdG eigh + complex-path measurement in
   float64, Pallas off.

Same state ⇒ every difference is pure numerics: this end-to-end pins the
production f32 + Pallas spectra pipeline at the reference's production
shape (small-shape numpy-oracle tests exist in tests/test_transport*;
nothing pinned 24×24 before).  Reference formulas:
src/Observables.jl:293-526.

Tolerances (stated, checked, recorded): eigenvalues 5e-5·‖E‖∞; ρ_s/σ_DC
and every spectral grid 2e-3 relative to that observable's peak value
(f32 matmul/eigh rounding at dim 2304 — measured headroom ~5-10×).
Also records the f-sum check on the oracle at the production grid + a
tight-η grid.  Writes examples/spectra_parity_24x24.json.  CPU-only.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

T_POINT = 0.0135031
POINT_INDEX = 7          # ascending 24-point grid; chains 21-23
REPLICAS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from dwavehmc_tpu.utils.platform import force_platform

    force_platform("cpu")
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu import LatticeSpec, SpectralSpec, make_params
    from dwavehmc_tpu.models import bdg_real
    from dwavehmc_tpu.models.bdg import assemble_bdg, static_hamiltonian
    from dwavehmc_tpu.models.params import HMCState
    from dwavehmc_tpu.models.transport import (
        current_matrix_elements,
        f_sum_check,
        measure_transport_and_spectra,
        optical_conductivity,
    )
    from dwavehmc_tpu.ops.spectral import fermi_factors
    from dwavehmc_tpu.sampler.hmc_real import HMCStateReal

    lat = LatticeSpec(24, 24)
    N = lat.n_sites
    beta = 1.0 / T_POINT
    spec = SpectralSpec(eta=8.0 / N, domega=0.2 * 8.0 / N, omega_max=4.0)
    ck = np.load(os.path.join(HERE, "examples", "T_scan_full_24x24",
                              "scan_checkpoint.npz"))
    chains = range(POINT_INDEX * REPLICAS, (POINT_INDEX + 1) * REPLICAS)

    results = []
    for c in chains:
        delta = ck["delta"][c]               # (N, 2) complex64
        disorder = ck["disorder"][c]         # (N,) float32
        log(f"chain {c}: |delta| mean {np.abs(delta).mean():.4f}")

        # --- production numerics: f32 real path + Pallas kernels --------
        p32 = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                          beta=beta, J=0.8, mass=1.0, dtype=jnp.float32)
        dre = jnp.asarray(delta.real, jnp.float32)
        dim_ = jnp.asarray(delta.imag, jnp.float32)
        dis32 = jnp.asarray(disorder, jnp.float32)
        M = bdg_real.assemble_embedding(
            lat, bdg_real.static_embedding(lat, 1.0, -0.35, -1.08, dis32),
            dre, dim_)
        ev32, X32, Y32 = bdg_real.diagonalize_embedding(M)
        z = jnp.zeros_like(dre)
        st32 = HMCStateReal(dre, dim_, z, z, dis32, ev32, X32, Y32,
                            jax.random.PRNGKey(0))
        from dwavehmc_tpu.models.transport_real import (
            measure_transport_and_spectra_real,
        )
        prod = measure_transport_and_spectra_real(lat, spec, p32, st32,
                                                  use_pallas=True)
        prod = jax.tree.map(np.asarray, prod)

        # --- oracle numerics: c128 BdG + f64 complex measurement --------
        p64 = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                          beta=beta, J=0.8, mass=1.0, dtype=jnp.float64)
        d64 = jnp.asarray(delta, jnp.complex128)
        dis64 = jnp.asarray(disorder, jnp.float64)
        H = assemble_bdg(lat, static_hamiltonian(lat, 1.0, -0.35, -1.08,
                                                 dis64), d64)
        ev64, U64 = jnp.linalg.eigh(H)
        st64 = HMCState(delta=d64, pi=jnp.zeros_like(d64),
                        disorder=dis64, evals=ev64, evecs=U64,
                        key=jax.random.PRNGKey(0))
        orac = measure_transport_and_spectra(lat, spec, p64, st64,
                                             use_pallas=False)
        orac = jax.tree.map(np.asarray, orac)

        def diff(a, b):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            peak = max(np.abs(b).max(), 1e-30)
            return {"max_abs": float(np.abs(a - b).max()),
                    "rel_to_peak": float(np.abs(a - b).max() / peak),
                    "oracle_peak": float(peak)}

        row = {
            "chain": int(c),
            "eigh_evals": {
                "max_abs": float(np.abs(np.sort(np.asarray(ev32, np.float64))
                                        - np.asarray(ev64)).max()),
                "scale": float(np.abs(np.asarray(ev64)).max())},
            "superfluid_stiffness": {
                "production": float(prod.superfluid_stiffness),
                "oracle": float(orac.superfluid_stiffness),
                **diff(prod.superfluid_stiffness,
                       orac.superfluid_stiffness)},
            "dc_conductivity": {
                "production": float(prod.dc_conductivity),
                "oracle": float(orac.dc_conductivity),
                **diff(prod.dc_conductivity, orac.dc_conductivity)},
            "optical_conductivity": diff(prod.optical_conductivity,
                                         orac.optical_conductivity),
            "dos": diff(prod.dos, orac.dos),
            "dos_AN": diff(prod.dos_AN, orac.dos_AN),
            "A_k0": diff(prod.A_k0, orac.A_k0),
        }

        # f-sum on the oracle state: production grid + tight-eta control
        f = fermi_factors(ev64, p64.beta)
        J2 = jnp.abs(current_matrix_elements(lat, U64, 1.0, -0.35)) ** 2
        om = jnp.asarray(spec.omega_grid(), jnp.float64)
        sg, sp, rel = f_sum_check(om, jnp.asarray(orac.optical_conductivity,
                                                  jnp.float64),
                                  ev64, f, J2, N)
        spec_t = SpectralSpec(eta=0.005, domega=0.002, omega_max=14.0)
        om_t = jnp.asarray(spec_t.omega_grid(), jnp.float64)
        sig_t = optical_conductivity(om_t, ev64, f, J2, spec_t.eta, N)
        _, _, rel_t = f_sum_check(om_t, sig_t, ev64, f, J2, N)
        row["f_sum"] = {"production_grid_rel_err": round(float(rel), 4),
                        "tight_eta_rel_err": round(float(rel_t), 4)}
        results.append(row)
        log(f"chain {c}: rho_s prod={row['superfluid_stiffness']['production']:.5f}"
            f" oracle={row['superfluid_stiffness']['oracle']:.5f}; "
            f"sigma(w) rel={row['optical_conductivity']['rel_to_peak']:.2e};"
            f" f-sum rel={row['f_sum']['production_grid_rel_err']}")

    # verdict against the stated tolerances
    TOL_EV = 5e-5
    TOL_REL = 2e-3
    ok = True
    for r in results:
        ok &= r["eigh_evals"]["max_abs"] <= TOL_EV * r["eigh_evals"]["scale"]
        for k in ("superfluid_stiffness", "dc_conductivity",
                  "optical_conductivity", "dos", "dos_AN", "A_k0"):
            ok &= r[k]["rel_to_peak"] <= TOL_REL

    out = {
        "T": T_POINT, "beta": beta, "lattice": "24x24",
        "state_source": ("examples/T_scan_full_24x24/scan_checkpoint.npz "
                         f"chains {list(chains)} (point-major layout)"),
        "production_leg": ("float32 real-symmetric-embedding QDWH eigh + "
                           "real-pair transport + Pallas sigma(w)/DC "
                           "kernel (interpret mode = identical f32 tile "
                           "math on CPU)"),
        "oracle_leg": "complex128 BdG eigh + float64 complex measurement",
        "tolerances": {"eigh_evals_rel": TOL_EV,
                       "observables_rel_to_peak": TOL_REL},
        "pass": bool(ok),
        "chains": results,
    }
    path = os.path.join(HERE, "examples", "spectra_parity_24x24.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps({"pass": out["pass"],
                      "sigma_rel": [r["optical_conductivity"]["rel_to_peak"]
                                    for r in results]}))


if __name__ == "__main__":
    main()
