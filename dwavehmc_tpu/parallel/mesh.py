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
