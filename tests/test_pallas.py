"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu.ops.pallas_kernels import weighted_lorentzian_sum


def oracle(omega, de, w2, eta):
    x = omega[:, None] - de[None, :]
    return ((eta / np.pi) / (x * x + eta * eta) @ w2)


def test_weighted_lorentzian_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n_w, M = 37, 1000   # deliberately unaligned → exercises padding
    omega = np.linspace(0.01, 4.0, n_w).astype(np.float32)
    de = rng.normal(scale=2.0, size=M).astype(np.float32)
    w2 = rng.uniform(size=M).astype(np.float32)
    eta = 0.05

    got = np.asarray(weighted_lorentzian_sum(
        jnp.asarray(omega), jnp.asarray(de), jnp.asarray(w2), eta,
        interpret=True))
    want = oracle(omega.astype(np.float64), de.astype(np.float64),
                  w2.astype(np.float64), eta)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_zero_weights_give_zero():
    omega = jnp.linspace(0.0, 1.0, 8)
    de = jnp.zeros(64)
    w2 = jnp.zeros(64)
    out = np.asarray(weighted_lorentzian_sum(omega, de, w2, 0.1,
                                             interpret=True))
    np.testing.assert_allclose(out, 0.0)


def test_transport_pallas_path_parity():
    """Full transport measurement: pallas path (interpret) == XLA fallback,
    including under vmap over an ensemble."""
    import functools

    import jax
    from jax.experimental.pallas import tpu as pltpu

    from dwavehmc_tpu import (
        LatticeSpec, SpectralSpec, init_chain_state, make_params,
    )
    from dwavehmc_tpu.models.transport import measure_transport_and_spectra
    from dwavehmc_tpu.parallel.ensemble import init_ensemble

    lat = LatticeSpec(4, 4)
    spec = SpectralSpec(eta=0.15, domega=0.1, omega_max=1.2)
    params = make_params(W=0.5, n_imp=0.25, beta=3.0, J=0.8,
                         dtype=jnp.float64)
    st = init_chain_state(lat, params, __import__("jax").random.PRNGKey(0),
                          dtype=jnp.float64, n_imp=0.25)
    a = measure_transport_and_spectra(lat, spec, params, st,
                                      use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        b = measure_transport_and_spectra(lat, spec, params, st,
                                          use_pallas=True)
    np.testing.assert_allclose(float(b.dc_conductivity),
                               float(a.dc_conductivity), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b.optical_conductivity),
                               np.asarray(a.optical_conductivity),
                               rtol=1e-4, atol=1e-7)

    sts = init_ensemble(lat, params, jax.random.PRNGKey(1), 2,
                        dtype=jnp.float64, n_imp=0.25)
    with pltpu.force_tpu_interpret_mode():
        res = jax.vmap(functools.partial(measure_transport_and_spectra,
                                         lat, spec, use_pallas=True),
                       in_axes=(None, 0))(params, sts)
    assert np.asarray(res.dc_conductivity).shape == (2,)


def test_single_peak_location():
    """One pair at ΔE=1 with weight 2 ⇒ S(ω) = 2·L(ω−1)."""
    omega = jnp.linspace(0.0, 2.0, 21)
    de = jnp.asarray([1.0])
    w2 = jnp.asarray([2.0])
    eta = 0.2
    got = np.asarray(weighted_lorentzian_sum(omega, de, w2, eta,
                                             interpret=True))
    x = np.asarray(omega) - 1.0
    want = 2.0 * (eta / np.pi) / (x * x + eta * eta)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rotation_s_parts_matches_xla():
    """Fused rotation-generator kernel (interpret mode) vs the XLA
    elementwise path — incl. the in-kernel capped arctan series (error
    <= 2e-6 on the damped domain; Mosaic has no atan2 lowering)."""
    import jax
    import jax.numpy as jnp

    from dwavehmc_tpu.ops.tracked_eigh import rotation_matrix_parts

    for n in (256, 300):
        k = jax.random.split(jax.random.PRNGKey(n), 3)
        a = jax.random.normal(k[0], (n, n), jnp.float32)
        tr = (a + a.T) * 0.01
        b = jax.random.normal(k[1], (n, n), jnp.float32)
        ti = (b - b.T) * 0.01
        d = jnp.sort(jax.random.normal(k[2], (n,), jnp.float32)) * 3.0
        sr0, si0 = rotation_matrix_parts(tr, ti, d)
        sr1, si1 = rotation_matrix_parts(tr, ti, d, use_pallas=True)
        assert float(jnp.max(jnp.abs(sr0 - sr1))) < 5e-6
        assert float(jnp.max(jnp.abs(si0 - si1))) < 5e-6
        # batched (the production call site is under vmap)
        f = jax.vmap(lambda x, y, z: rotation_matrix_parts(
            x, y, z, use_pallas=True))
        srb, sib = f(jnp.stack([tr, tr * 0.5]), jnp.stack([ti, ti * 2.0]),
                     jnp.stack([d, d * 1.1]))
        assert srb.shape == (2, n, n)
