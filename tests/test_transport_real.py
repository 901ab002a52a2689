"""Complex-free transport must equal the complex implementation leaf for
leaf (which itself is oracle-tested against the reference formulas)."""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, SpectralSpec, init_chain_state, make_params
from dwavehmc_tpu.models.observables import measure_observables
from dwavehmc_tpu.models.observables_real import measure_observables_real
from dwavehmc_tpu.models.transport import measure_transport_and_spectra
from dwavehmc_tpu.models.transport_real import measure_transport_and_spectra_real
from dwavehmc_tpu.sampler.hmc_real import from_complex_state

LAT = LatticeSpec(4, 4)
SPEC = SpectralSpec(eta=0.15, domega=0.1, omega_max=1.2)


def make_states(seed=0, beta=3.0):
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.6, n_imp=0.25,
                         beta=beta, J=0.8, mass=1.0, dtype=jnp.float64)
    cs = init_chain_state(LAT, params, jax.random.PRNGKey(seed),
                          dtype=jnp.float64, n_imp=0.25)
    return params, cs, from_complex_state(cs)


def test_transport_real_matches_complex():
    params, cs, rs = make_states()
    a = measure_transport_and_spectra(LAT, SPEC, params, cs,
                                      use_pallas=False)
    b = measure_transport_and_spectra_real(LAT, SPEC, params, rs,
                                           use_pallas=False)
    np.testing.assert_allclose(float(b.superfluid_stiffness),
                               float(a.superfluid_stiffness), atol=1e-10)
    np.testing.assert_allclose(float(b.dc_conductivity),
                               float(a.dc_conductivity), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(b.optical_conductivity),
                               np.asarray(a.optical_conductivity), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(b.dos), np.asarray(a.dos),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(b.dos_AN), np.asarray(a.dos_AN),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.A_k0), np.asarray(a.A_k0),
                               rtol=1e-8, atol=1e-12)


def test_observables_real_matches_complex():
    params, cs, rs = make_states(seed=4, beta=6.0)
    a = measure_observables(LAT, params, cs)
    b = measure_observables_real(LAT, params, rs)
    for name in a._fields:
        np.testing.assert_allclose(float(getattr(b, name)),
                                   float(getattr(a, name)),
                                   rtol=1e-9, atol=1e-12, err_msg=name)


def test_transport_real_nonrectangular_lattice():
    """Lx ≠ Ly exercises the DFT layout/transpose conventions."""
    lat = LatticeSpec(4, 6)
    params = make_params(W=0.5, n_imp=0.25, beta=3.0, J=0.8,
                         dtype=jnp.float64)
    cs = init_chain_state(lat, params, jax.random.PRNGKey(7),
                          dtype=jnp.float64, n_imp=0.25)
    rs = from_complex_state(cs)
    a = measure_transport_and_spectra(lat, SPEC, params, cs,
                                      use_pallas=False)
    b = measure_transport_and_spectra_real(lat, SPEC, params, rs,
                                           use_pallas=False)
    np.testing.assert_allclose(np.asarray(b.A_k0), np.asarray(a.A_k0),
                               rtol=1e-8, atol=1e-12)
    assert b.A_k0.shape == (4, 6)
