"""Ensemble tests: vmap batching, mesh sharding on the 8-device CPU mesh,
chain independence, and the scanned segment runner.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, hmc_sweep, make_params
from dwavehmc_tpu.parallel.ensemble import (
    ensemble_sweep,
    ensemble_transport_jit,
    init_ensemble,
    make_mesh,
    run_segment_jit,
    shard_ensemble,
)
from dwavehmc_tpu.models.params import SpectralSpec

LAT = LatticeSpec(4, 4)


def make_ensemble(n_chains=8, beta=5.0, seed=0):
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.25,
                         beta=beta, J=1.0, mass=1.0, dtype=jnp.float64)
    states = init_ensemble(LAT, params, jax.random.PRNGKey(seed), n_chains,
                           dtype=jnp.float64, n_imp=0.25)
    return params, states


def test_ensemble_matches_single_chain():
    """vmapped sweep == per-chain single sweep, chain by chain."""
    params, states = make_ensemble(n_chains=3)
    new_states, info = ensemble_sweep(LAT, params, states, 4, 0.05)
    for c in range(3):
        single = jax.tree.map(lambda x: x[c], states)
        s1, i1 = hmc_sweep(LAT, params, single, 4, 0.05)
        np.testing.assert_allclose(np.asarray(s1.delta),
                                   np.asarray(new_states.delta[c]), atol=1e-12)
        assert bool(i1.accepted) == bool(info.accepted[c])


def test_chains_have_distinct_disorder_and_keys():
    _, states = make_ensemble(n_chains=4)
    d = np.asarray(states.disorder)
    assert not np.array_equal(d[0], d[1])
    k = np.asarray(states.key)
    assert len({tuple(np.asarray(jax.random.key_data(states.key[i])).ravel())
                for i in range(4)}) == 4
    del k


def test_sharded_segment_runs_on_8_device_mesh():
    """End-to-end: shard 8 chains over the 8 virtual devices, run a scanned
    segment, check per-chain results stay finite and sharding is applied."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    params, states = make_ensemble(n_chains=8)
    states = shard_ensemble(states, mesh)
    assert len(states.delta.sharding.device_set) == 8

    states, seg = run_segment_jit(LAT, params, states, 5, 4, 0.05)
    assert seg.accepted.shape == (5, 8)
    assert np.all(np.isfinite(np.asarray(seg.dH)))
    assert np.all(np.isfinite(np.asarray(seg.observables.total_energy)))
    # states keep their sharding through the scan
    assert len(states.delta.sharding.device_set) == 8


def test_segment_equals_sequential_sweeps():
    params, states = make_ensemble(n_chains=2, seed=3)
    out_states, seg = run_segment_jit(LAT, params, states, 3, 4, 0.05)
    # sequential re-run
    st = states
    for i in range(3):
        st, info = ensemble_sweep(LAT, params, st, 4, 0.05)
        np.testing.assert_array_equal(np.asarray(info.accepted),
                                      np.asarray(seg.accepted[i]))
    np.testing.assert_allclose(np.asarray(st.delta),
                               np.asarray(out_states.delta), atol=1e-12)


def test_ensemble_transport_shapes():
    params, states = make_ensemble(n_chains=4)
    spec = SpectralSpec(eta=0.2, domega=0.2, omega_max=1.0)
    res = ensemble_transport_jit(LAT, spec, params, states)
    assert res.superfluid_stiffness.shape == (4,)
    assert res.optical_conductivity.shape == (4, spec.n_omega)
    assert res.A_k0.shape == (4, LAT.Lx, LAT.Ly)
    assert np.all(np.isfinite(np.asarray(res.dos)))


def test_per_chain_params_grid():
    """params_axis=0: each chain gets its own β (a grid scan in one jit)."""
    n = 4
    base = make_params(beta=1.0, J=1.0, dtype=jnp.float64)
    betas = jnp.array([1.0, 2.0, 4.0, 8.0], dtype=jnp.float64)
    params = base._replace(
        beta=betas,
        **{f: jnp.broadcast_to(getattr(base, f), (n,))
           for f in base._fields if f != "beta"})
    states = init_ensemble(LAT, base, jax.random.PRNGKey(1), n,
                           dtype=jnp.float64, n_imp=0.0)
    states, seg = run_segment_jit(LAT, params, states, 2, 4, 0.02,
                                  True, 0)
    # hotter chains (smaller β) should have larger |Δ| fluctuations on average
    assert seg.observables.total_energy.shape == (2, n)
    assert np.all(np.isfinite(np.asarray(seg.observables.total_energy)))
