"""Run configuration: one dataclass + CLI parser.

The reference has no config system — parameters are positional constructor
args plus constants edited at the top of each script (SURVEY §5).  Here a
single ``RunConfig`` covers lattice, physics, spectral grid, HMC schedule
and ensemble settings, serializes to JSON next to the outputs, and feeds
every scan driver through ``add_cli_args``/``from_namespace``.
"""

from __future__ import annotations

import argparse
import dataclasses

import jax.numpy as jnp

from ..models.lattice import LatticeSpec
from ..models.params import ModelParams, SpectralSpec, make_params


@dataclasses.dataclass
class RunConfig:
    # lattice
    Lx: int = 24
    Ly: int = 24
    # physics (reference defaults: scripts/batch_scan_T.jl:10-27)
    t: float = 1.0
    tp: float = -0.35
    mu: float = -1.08
    W: float = 1.0
    n_imp: float = 0.05
    beta: float = 10.0
    J: float = 0.8
    mass: float = 1.0
    # spectral grid (η = 8/N convention, scripts/batch_scan_T.jl:17-19)
    eta: float | None = None        # None → 8 / (Lx·Ly)
    domega: float | None = None     # None → 0.2·η
    omega_max: float = 4.0
    # HMC schedule (src/Simulation.jl:34-41 keyword defaults)
    n_therm: int = 100
    n_measure: int = 500
    Nt_therm_init: int = 10
    Nt_measure: int = 5
    measure_transport_freq: int = 1
    bin_size: int = 5
    # ensemble / numerics
    n_chains: int = 1
    seed: int = 0
    dtype: str = "float32"          # "float32" | "float64"
    path: str = "auto"              # "auto" | "real" | "complex" compute path
    eigh_mode: str = "exact"        # "exact" | "tracked" (real path only)
    tracked_iters: int = 6          # refinement rotations per leapfrog step
    anchor_every: int = 1           # exact-eigh anchor every K sweeps
    refine_iters: int = 6           # fast endpoint refinement (cheap anchors)
    #                                 Under the exp2 endpoint algebra the
    #                                 refine trim hits its bias floor
    #                                 fast: 6 (and even 4) match 12's
    #                                 paired bias (0.0165) at 24×24/b64
    #                                 with med_dH ~0 (reversible) —
    #                                 +19.6% traj/s with polish_iters=3
    #                                 (rotation_ab_24x24_pass9_refine)
    polish_iters: int = 3           # full-precision endpoint polish rotations
    #                                 (3 reaches the 24×24 exp2 bias
    #                                 floor — pass-9; under ns, 4 matched
    #                                 6 at 1.21e-3 on 16×16 and 2
    #                                 degraded to 4.3e-3)
    polish_precision: str = "highest"  # matmul precision of the polish
    #                                 ROTATIONS ("highest" = 6 MXU passes,
    #                                 "high" = 3); the eigenvalue readout
    #                                 is always "highest" (basis noise is
    #                                 second-order in the dH error)
    polish_correction: bool = False  # second-order Rayleigh correction on
    #                                 the cheap-anchor eigenvalue readout
    #                                 (O(n²) elementwise; removes the
    #                                 leading O(res²/gap) readout error so
    #                                 polish_iters can shrink — validate
    #                                 bias on hardware before flipping)
    exact_solver: str = "ph"        # anchor/init exact eigensolver:
    #                                 "ph" (default: PH-split half-dim
    #                                 solver behind the runtime floor
    #                                 guard — lax.cond falls back to QDWH
    #                                 when the spectrum sits under the
    #                                 minimax schedule's 1e-5·‖M‖ floor;
    #                                 ops/ph_eigh.diagonalize_embedding_
    #                                 ph_guarded; measured +10% end-to-end
    #                                 at 24×24/b64, decision parity 0.977
    #                                 — examples/ph_anchor_ab_24x24.json)
    #                                 | "qdwh" (XLA eigh on the full
    #                                 embedding, no guard needed)
    rot_dtype: str = "float32"      # "float32" | "bfloat16": storage dtype of
    #                                 in-trajectory tracked rotations (bf16 is
    #                                 ~1.2x faster at 24x24/b64, bias-validated;
    #                                 endpoint refine/polish always f32)
    rot_scheme: str = "exp2"        # "exp2" (default) | "ns": tracked
    #                                 rotation application.  "exp2" =
    #                                 U(I+S+S²/2): Gram error S⁴/4 (vs
    #                                 −S² for U(I+S)), so one
    #                                 Newton–Schulz step beats the "ns"
    #                                 scheme's two at 18 vs 21 fast-path
    #                                 matmuls/iteration
    #                                 (ops/tracked_eigh.tracked_step).
    #                                 Hardware-validated default:
    #                                 +48% at 16×16/b8 at acc 0.93
    #                                 (examples/rotation_ab_16x16.json);
    #                                 at 24×24/b64 the exp2 endpoint
    #                                 algebra removes the ns endpoint's
    #                                 cheap-readout deficit — paired dH
    #                                 bias 4.2 → 0.018, median segment
    #                                 dH −0.001 (reversible), acc 0.953
    #                                 (rotation_ab_24x24_pass6_pc.json)
    use_pallas_s: bool | None = None  # fused Pallas rotation-generator
    #                                 kernel; None = auto (on on TPU)
    metropolis_readout: str = "device"  # "device" | "host": where the
    #                                 Metropolis ΔH is evaluated.  "host"
    #                                 moves the once-per-sweep energy
    #                                 readout to the host in f64
    #                                 (ops/host_energy.py) — exact accept
    #                                 decisions past the f32 conditioning
    #                                 wall (β ≳ 3e3, reference grids reach
    #                                 β = 1e5 / T = 1e-4); trajectories
    #                                 stay on-device.  Tracked real path,
    #                                 vectorized scans.
    Nt_escalate: bool = True        # vectorized scan: one-shot global Nt
    #                                 escalation after the probe window when
    #                                 the worst chain's acceptance < 0.60
    #                                 (reference controller intent under a
    #                                 single static-shape ensemble)
    anneal_stages: int = 0          # vectorized scan: β-ladder warm start.
    #                                 The reference carries the chain state
    #                                 from each β point into the next
    #                                 (benchmark_beta_scan.jl:66-87), which
    #                                 is how it equilibrates β=1e5 with 20
    #                                 therm sweeps; a cold start cannot.
    #                                 The vectorized equivalent: before
    #                                 thermalization, each chain runs
    #                                 `anneal_stages` stages of
    #                                 `anneal_sweeps` sweeps along a
    #                                 geometric β ramp from
    #                                 min(β_target, anneal_start_beta) up
    #                                 to β_target.  0 = off.
    anneal_sweeps: int = 5          # sweeps per annealing stage
    anneal_start_beta: float = 100.0  # ramp origin; chains with
    #                                 β ≤ this skip the ramp (they run
    #                                 their target β throughout)
    meas_probe_sweeps: int = 10     # vectorized scan: adapt-only sweeps
    #                                 run AT the measurement (Nt, dt)
    #                                 before any row is recorded — therm
    #                                 tunes dt at Nt_therm; this validates
    #                                 (shrink-only) at Nt_measure, where
    #                                 the same trajectory length means a
    #                                 Nt_therm/Nt_measure× larger step.
    #                                 0 = off.
    # io
    out_dir: str = "runs/run"
    verbose: bool = True
    checkpoint_freq: int = 50
    resume: bool = False
    profile_dir: str | None = None   # jax.profiler trace dir (TensorBoard)

    def lattice(self) -> LatticeSpec:
        return LatticeSpec(self.Lx, self.Ly)

    def spectral(self) -> SpectralSpec:
        eta = self.eta if self.eta is not None else 8.0 / (self.Lx * self.Ly)
        domega = self.domega if self.domega is not None else 0.2 * eta
        return SpectralSpec(eta=eta, domega=domega, omega_max=self.omega_max)

    def params(self) -> ModelParams:
        return make_params(t=self.t, tp=self.tp, mu=self.mu, W=self.W,
                           n_imp=self.n_imp, beta=self.beta, J=self.J,
                           mass=self.mass, dtype=self.jax_dtype())

    def jax_dtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    def rot_jax_dtype(self):
        """None (= carry dtype) unless bf16 rotations are requested."""
        return jnp.bfloat16 if self.rot_dtype == "bfloat16" else None

    def resolved_ns_steps(self) -> int:
        """Newton–Schulz steps per in-trajectory rotation: the exp2
        scheme starts from Gram error S⁴/4, so ONE step reaches ~σ⁸/16 —
        strictly tighter than the ns scheme's two steps (~σ⁸)."""
        return 1 if self.rot_scheme == "exp2" else 2

    def use_pallas_rot(self) -> bool:
        """Route the tracked rotation-generator construction through the
        fused Pallas kernel (ops/pallas_kernels.rotation_s_parts) —
        follows the global Pallas default (on on TPU, off on CPU where
        the XLA path is what the oracle tests pin)."""
        if self.use_pallas_s is not None:
            return self.use_pallas_s
        from ..ops.pallas_kernels import pallas_default

        return pallas_default()

    def resolved_path(self) -> str:
        """"real" (complex-free) on TPU, "complex" elsewhere, unless forced.

        The axon TPU runtime executes real dtypes only, so "auto" always
        picks the real-pair path on TPU."""
        if self.path != "auto":
            return self.path
        import jax

        try:
            return "real" if jax.devices()[0].platform == "tpu" else "complex"
        except Exception:  # noqa: BLE001
            return "complex"

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def validate(self) -> None:
        """Reject silently-unsupported combinations at driver entry.

        ``metropolis_readout='host'`` is only wired through the tracked
        real-path segment runner (parallel/ensemble.run_segment_hostacc);
        with eigh_mode='exact' or the complex path it would silently fall
        back to the f32 device ΔH — precisely the regime where the user
        asked for exactness (ADVICE r3)."""
        if self.metropolis_readout not in ("device", "host"):
            raise ValueError(
                f"metropolis_readout={self.metropolis_readout!r}: expected "
                "'device' or 'host'")
        if self.rot_scheme not in ("ns", "exp2"):
            raise ValueError(f"rot_scheme={self.rot_scheme!r}: expected "
                             "'ns' or 'exp2'")
        if self.exact_solver not in ("qdwh", "ph"):
            raise ValueError(f"exact_solver={self.exact_solver!r}: expected "
                             "'qdwh' or 'ph'")
        if self.metropolis_readout == "host":
            if self.eigh_mode != "tracked" or self.resolved_path() != "real":
                raise ValueError(
                    "metropolis_readout='host' requires eigh_mode='tracked' "
                    "and the real compute path (got eigh_mode="
                    f"{self.eigh_mode!r}, path={self.resolved_path()!r}); "
                    "the exact host-f64 readout is wired through the "
                    "tracked real-path runner only — see "
                    "parallel/ensemble.run_segment_hostacc")


def add_cli_args(parser: argparse.ArgumentParser,
                 defaults: RunConfig | None = None):
    d = defaults or RunConfig()
    for f in dataclasses.fields(RunConfig):
        val = getattr(d, f.name)
        if f.type == "bool | None":      # tri-state: auto/None, true, false
            parser.add_argument(
                f"--{f.name}",
                type=lambda s: (None if s.lower() in ("none", "auto")
                                else s.lower() in ("1", "true", "yes")),
                default=val)
        elif f.type == "bool" or isinstance(val, bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=val)
        elif val is None:
            parser.add_argument(f"--{f.name}", type=float, default=None)
        else:
            parser.add_argument(f"--{f.name}", type=type(val), default=val)
    return parser


def from_namespace(ns: argparse.Namespace) -> RunConfig:
    names = {f.name for f in dataclasses.fields(RunConfig)}
    return RunConfig(**{k: v for k, v in vars(ns).items() if k in names})
