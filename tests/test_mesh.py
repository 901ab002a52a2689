"""Mesh-construction tests: 2-D (grid × chain) sharding on the virtual
8-device CPU mesh, end-to-end through a scanned segment."""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, make_params
from dwavehmc_tpu.parallel.ensemble import init_ensemble, run_segment_jit
from dwavehmc_tpu.parallel.mesh import (
    grid_chain_sharding,
    make_mesh_1d,
    make_mesh_2d,
    setup_distributed,
)


def test_setup_distributed_noop_single_process():
    setup_distributed()  # must not raise or initialize anything


def test_mesh_shapes():
    m1 = make_mesh_1d()
    assert m1.devices.shape == (8,)
    m2 = make_mesh_2d(grid_points=4)
    assert m2.devices.shape == (4, 2)
    assert m2.axis_names == ("grid", "chain")
    m3 = make_mesh_2d(grid_points=3)  # 3 doesn't divide 8 → falls to 2
    assert m3.devices.shape[0] in (1, 2)


def test_segment_on_2d_mesh():
    lat = LatticeSpec(4, 4)
    params = make_params(W=0.5, n_imp=0.25, beta=5.0, J=1.0,
                         dtype=jnp.float64)
    G, C = 4, 2
    mesh = make_mesh_2d(G)
    states = init_ensemble(lat, params, jax.random.PRNGKey(0), G * C,
                           dtype=jnp.float64, n_imp=0.25)
    sh = grid_chain_sharding(mesh)
    states = jax.tree.map(lambda x: jax.device_put(x, sh), states)
    assert len(states.delta.sharding.device_set) == 8

    states, seg = run_segment_jit(lat, params, states, 3, 4, 0.05)
    assert seg.accepted.shape == (3, G * C)
    assert np.all(np.isfinite(np.asarray(seg.dH)))
