"""Device-mesh construction, incl. the multi-host path.

The reference's latent intent for distribution is MPI/Distributed over
Markov chains (doc/algorithm.md:104; unused ClusterManagers dep).  The
TPU-native form: ``jax.distributed.initialize`` per host + one global mesh
whose axes carry the embarrassingly-parallel ensemble dimensions.  Chains
never communicate during sampling — only observable reductions cross
chips, riding ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed(coordinator_address: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> None:
    """Initialize multi-host JAX when running under a launcher.

    No-op in single-process runs.  Arguments default to the standard env
    vars consumed by ``jax.distributed.initialize`` (JAX auto-detects on
    Cloud TPU pods).
    """
    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if n <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def distributed_env_spec() -> dict | None:
    """Multi-host launch parameters from the environment, or None.

    Recognized (either spelling wins when set):
      DWAVEHMC_COORDINATOR / JAX_COORDINATOR_ADDRESS  host:port of process 0
      DWAVEHMC_NUM_PROCESSES / JAX_NUM_PROCESSES      world size
      DWAVEHMC_PROCESS_ID / JAX_PROCESS_ID            this process's rank

    On Cloud TPU pods all three are optional (``jax.distributed``
    auto-detects); a bare DWAVEHMC_DISTRIBUTED=1 requests auto-detection.
    """
    def _get(*names):
        for n in names:
            v = os.environ.get(n)
            if v not in (None, ""):
                return v
        return None

    coord = _get("DWAVEHMC_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    nproc = _get("DWAVEHMC_NUM_PROCESSES", "JAX_NUM_PROCESSES")
    pid = _get("DWAVEHMC_PROCESS_ID", "JAX_PROCESS_ID")
    flag = os.environ.get("DWAVEHMC_DISTRIBUTED", "0") == "1"
    if coord is None and not flag and (nproc is None or int(nproc) <= 1):
        return None
    return {"coordinator_address": coord,
            "num_processes": None if nproc is None else int(nproc),
            "process_id": None if pid is None else int(pid)}


def maybe_setup_distributed() -> bool:
    """Env-gated multi-host init for script entry points: call before any
    device use.  Returns True when ``jax.distributed.initialize`` ran.

    This is the DCN leg the reference never implemented (its
    ClusterManagers dep is unused — Project.toml:9, doc/algorithm.md:104):
    each host drives its addressable chips, ``jax.devices()`` becomes the
    global list, and the ensemble meshes below span all hosts — chain
    sampling stays host-local, only observable reductions cross DCN.
    Unrunnable in this single-host container (no second host to join);
    the mesh/sharding layout logic is what the unit tests pin.
    """
    spec = distributed_env_spec()
    if spec is None:
        return False
    jax.distributed.initialize(**{k: v for k, v in spec.items()
                                  if v is not None})
    return True


def make_ensemble_mesh(grid_points: int | None = None, devices=None) -> Mesh:
    """The ensemble mesh over ALL processes' devices (1-D ``('chain',)`` or
    2-D ``('grid', 'chain')`` when ``grid_points`` is given).

    After ``maybe_setup_distributed`` this spans every host in the job —
    build arrays with ``distribute_global_batch`` so each process supplies
    only its addressable shard.
    """
    if grid_points is None:
        return make_mesh_1d(devices=devices)
    return make_mesh_2d(grid_points, devices=devices)


def process_batch_slice(n_total: int, mesh: Mesh) -> slice:
    """This process's contiguous slice of a length-``n_total`` global batch
    laid out over ``mesh``'s devices in order.  n_total must divide evenly
    over the device list (callers pad the ensemble to the mesh size)."""
    devs = list(mesh.devices.flat)
    n_dev = len(devs)
    if n_total % n_dev:
        raise ValueError(f"batch {n_total} not divisible by {n_dev} devices")
    per = n_total // n_dev
    mine = [i for i, d in enumerate(devs) if d.process_index
            == jax.process_index()]
    if not mine:
        raise ValueError("no addressable devices in mesh for this process")
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError("addressable devices not contiguous in mesh order; "
                         "reorder the device list per process_index")
    return slice(mine[0] * per, (mine[-1] + 1) * per)


def distribute_global_batch(local_leaves, mesh: Mesh, n_total: int):
    """Assemble a globally-sharded ensemble pytree from per-process data.

    ``local_leaves`` is a pytree whose leaves carry THIS process's chains
    on the leading axis (length = this process's share of ``n_total``).
    Single-process: equivalent to ``device_put`` with the batch sharding.
    Multi-process: uses ``jax.make_array_from_process_local_data`` so no
    host ever materializes the global batch.
    """
    sh = NamedSharding(mesh, P(mesh.axis_names))

    def put(x):
        global_shape = (n_total,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sh, np.asarray(x),
                                                      global_shape)

    return jax.tree.map(put, local_leaves)


def make_mesh_1d(axis_name: str = "chain", devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(grid_points: int, axis_names=("grid", "chain"),
                 devices=None) -> Mesh:
    """2-D mesh (grid × chain) for vectorized parameter scans: grid points
    spread over one axis, replica chains over the other, so per-point
    reductions stay within a sub-ring."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    g = min(grid_points, n)
    while n % g:
        g -= 1
    return Mesh(np.asarray(devices).reshape(g, n // g), axis_names)


def grid_chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ensemble arrays laid out (grid*chain, ...) flattened:
    leading axis split over both mesh axes."""
    return NamedSharding(mesh, P(mesh.axis_names))
