#!/usr/bin/env python
"""Term-by-term superfluid-stiffness inspection
(rebuild of scripts/debug_transport.jl).

Dumps the diamagnetic term, the paramagnetic Λ_xx, their difference, and
cross-checks the clean normal state against the analytic plane-wave Drude
weight (the dual-formula verification idea of debug_transport.jl:50-95).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=8)
    p.add_argument("--beta", type=float, default=7.0)
    p.add_argument("--delta", type=float, default=0.3)
    p.add_argument("--W", type=float, default=0.0)
    p.add_argument("--n_imp", type=float, default=0.0)
    p.add_argument("--dtype", default="float64")
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))
    if ns.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from dwavehmc_tpu import (
        LatticeSpec, init_chain_state, make_params, uniform_dwave_delta,
    )
    from dwavehmc_tpu.models.lattice import dispersion, k_grid
    from dwavehmc_tpu.models.transport import (
        current_matrix_elements, diamagnetic_term, paramagnetic_term,
    )
    from dwavehmc_tpu.ops.spectral import fermi_factors

    dtype = jnp.float64 if ns.dtype == "float64" else jnp.float32
    t, tp, mu = 1.0, -0.35, -1.08
    lat = LatticeSpec(ns.L, ns.L)
    params = make_params(t=t, tp=tp, mu=mu, W=ns.W, n_imp=ns.n_imp,
                         beta=ns.beta, J=1.6, dtype=dtype)
    delta0 = uniform_dwave_delta(lat, ns.delta, dtype=dtype)
    st = init_chain_state(lat, params, jax.random.PRNGKey(0), delta0=delta0,
                          dtype=dtype, n_imp=ns.n_imp)

    f = fermi_factors(st.evals, params.beta)
    J_mn = current_matrix_elements(lat, st.evecs, t, tp)
    J2 = jnp.abs(J_mn) ** 2
    dia = float(diamagnetic_term(lat, st.evals, st.evecs, t, tp, params.beta))
    lam = float(paramagnetic_term(st.evals, f, J2, params.beta, lat.n_sites))
    print(f"{ns.L}x{ns.L}, beta={ns.beta}, |Δ|={ns.delta}, W={ns.W}")
    print(f"diamagnetic <-Kx> : {dia:+.6f}")
    print(f"paramagnetic Λ_xx : {lam:+.6f}")
    print(f"stiffness ρ_s     : {dia-lam:+.6f}")

    if ns.W == 0.0 and ns.delta == 0.0:
        kx, ky = k_grid(lat)
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        eps = dispersion(KX, KY, t, tp, mu)
        fk = 1.0 / (1.0 + np.exp(ns.beta * eps))
        d2e = 2 * t * np.cos(KX) + 4 * tp * np.cos(KX) * np.cos(KY)
        v = 2 * t * np.sin(KX) + 4 * tp * np.sin(KX) * np.cos(KY)
        drude = (2.0 / lat.n_sites) * np.sum(
            d2e * fk - ns.beta * fk * (1 - fk) * v**2)
        print(f"analytic Drude    : {drude:+.6f} "
              f"(diff {abs(dia-lam-drude):.2e})")


if __name__ == "__main__":
    main()
