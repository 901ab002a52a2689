"""dwavehmc_tpu — TPU-native Hybrid Monte Carlo for disordered d-wave SC.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
YinkaiYu/Hybrid-Monte-Carlo-for-d-wave-SC (pure-Julia DwaveHMC):
classical HMC sampling of complex bond pairing fields Δ_ij where every
force/energy evaluation diagonalizes the dense 2N×2N BdG matrix, plus the
full measurement suite (order parameters, superfluid stiffness, optical/DC
conductivity, DOS, spectral function) — redesigned as pure functions over
pytree state with the ensemble (disorder realizations × chains × grid
points) as a vmapped, mesh-sharded batch axis.
"""

from .models.lattice import LatticeSpec, neighbor_tables
from .models.params import (
    HMCState,
    ModelParams,
    SpectralSpec,
    init_delta,
    make_params,
    sample_disorder,
    uniform_dwave_delta,
)
from .models.bdg import assemble_bdg, diagonalize, pairing_block, static_hamiltonian
from .ops.forces import hmc_forces, pairing_correlations
from .ops.spectral import fermi_factors, fermion_energy, total_energy
from .sampler.hmc import SweepInfo, calc_optimal_dt, hmc_sweep, init_chain_state

__version__ = "0.1.0"

__all__ = [
    "LatticeSpec", "neighbor_tables",
    "HMCState", "ModelParams", "SpectralSpec",
    "make_params", "sample_disorder", "init_delta", "uniform_dwave_delta",
    "assemble_bdg", "diagonalize", "pairing_block", "static_hamiltonian",
    "hmc_forces", "pairing_correlations",
    "fermi_factors", "fermion_energy", "total_energy",
    "SweepInfo", "calc_optimal_dt", "hmc_sweep", "init_chain_state",
]
