"""Ensemble parallelism: vmapped chains sharded over a TPU mesh.

The reference runs one Markov chain per Julia process and loops serially
over temperature points (scripts/batch_scan_T.jl:54); its docs suggest —
but never implement — MPI parallelism over chains (doc/algorithm.md:104,
unused ClusterManagers dep).  Here the ensemble axis (disorder
realizations × chains × grid points) is a leading batch dimension:

 * ``vmap`` turns the single-chain sweep into a batched sweep whose eigh /
   matmuls become large batched MXU ops,
 * ``NamedSharding(P("chain"))`` over a 1-D device mesh shards that axis;
   chains are embarrassingly parallel so the only collectives are the
   observable reductions XLA inserts at the end,
 * a whole measurement segment (many sweeps) runs as one ``lax.scan``
   inside a single jit — the host only sees per-segment summaries.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lattice import LatticeSpec
from ..models.observables import ObservablesResult, measure_observables
from ..models.params import HMCState, ModelParams, SpectralSpec
from ..models.transport import SpectrumResult, measure_transport_and_spectra
from ..sampler.hmc import SweepInfo, hmc_sweep, init_chain_state

CHAIN_AXIS = "chain"


def make_mesh(devices=None, axis_name: str = CHAIN_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; chains ride this axis."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def chain_sharding(mesh: Mesh, axis_name: str = CHAIN_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_ensemble(states: HMCState, mesh: Mesh,
                   axis_name: str = CHAIN_AXIS,
                   sharding: NamedSharding | None = None) -> HMCState:
    """Place every leaf's leading (chain) axis across the mesh.  An explicit
    ``sharding`` overrides the default 1-D chain sharding (e.g. the 2-D
    grid×chain layout from parallel/mesh.grid_chain_sharding)."""
    sh = sharding if sharding is not None else chain_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


def init_ensemble(lat: LatticeSpec, params: ModelParams, key, n_chains: int,
                  *, dtype=jnp.float32, n_imp: float = 0.0, delta0=None,
                  mesh: Mesh | None = None) -> HMCState:
    """n_chains independent chains: per-chain disorder realization, Δ start
    and PRNG key.  Optionally sharded over ``mesh``."""
    keys = jax.random.split(key, n_chains)
    init = functools.partial(init_chain_state, lat, params, dtype=dtype,
                             n_imp=n_imp, delta0=delta0)
    states = jax.vmap(init)(keys)
    if mesh is not None:
        states = shard_ensemble(states, mesh)
    return states


def ensemble_sweep(lat: LatticeSpec, params: ModelParams, states: HMCState,
                   Nt: int, dt, *, params_axis=None, dt_axis=None
                   ) -> tuple[HMCState, SweepInfo]:
    """One HMC sweep on every chain.  ``params_axis=0`` maps per-chain
    parameters (e.g. a β-grid sharded with the chains); ``dt_axis=0`` maps
    a per-chain step size (needed because dt ∝ 1/√β)."""
    fn = functools.partial(hmc_sweep, lat, Nt=Nt)
    fn2 = lambda p, s, d: fn(p, s, dt=d)  # noqa: E731
    return jax.vmap(fn2, in_axes=(params_axis, 0, dt_axis))(
        params, states, jnp.asarray(dt))


class SegmentResult(NamedTuple):
    """Per-sweep records of one scanned segment: leaves (n_sweeps, n_chains, …)."""

    accepted: jax.Array
    dH: jax.Array
    observables: ObservablesResult


def run_segment(lat: LatticeSpec, params: ModelParams, states: HMCState,
                n_sweeps: int, Nt: int, dt, *, measure: bool = True,
                params_axis=None, dt_axis=None
                ) -> tuple[HMCState, SegmentResult]:
    """``n_sweeps`` sweeps over the whole ensemble as ONE lax.scan —
    the replacement for the reference's per-sweep host loop
    (src/Simulation.jl:104-130,151-228).  jit-compiled per (Nt, n_sweeps).
    """

    def body(states, _):
        states, info = ensemble_sweep(lat, params, states, Nt, dt,
                                      params_axis=params_axis,
                                      dt_axis=dt_axis)
        if measure:
            obs = jax.vmap(functools.partial(measure_observables, lat),
                           in_axes=(params_axis, 0))(params, states)
        else:
            obs = None
        return states, (info.accepted, info.dH, obs)

    states, (acc, dH, obs) = lax.scan(body, states, None, length=n_sweeps)
    return states, SegmentResult(accepted=acc, dH=dH, observables=obs)


def ensemble_transport(lat: LatticeSpec, spec: SpectralSpec,
                       params: ModelParams, states: HMCState,
                       *, params_axis=None) -> SpectrumResult:
    """Heavy measurement on every chain (leaves gain a leading chain axis)."""
    fn = functools.partial(measure_transport_and_spectra, lat, spec)
    return jax.vmap(fn, in_axes=(params_axis, 0))(params, states)


# real-pair (complex-free) ensemble — the TPU production path ---------------

def init_ensemble_real(lat: LatticeSpec, params: ModelParams, key,
                       n_chains: int, *, dtype=jnp.float32,
                       n_imp: float = 0.0, mesh: Mesh | None = None,
                       exact_solver: str = "qdwh",
                       init_chunk: int | None = None):
    """``init_chunk``: diagonalize the initial ensemble in sub-batches of
    this many chains.  The QDWH eigh workspace is several dim² buffers
    PER CHAIN (~0.5 GiB at 32×32), so a single (48, 4096, 4096) init
    eigh RESOURCE_EXHAUSTs a 16 GiB chip whose steady-state segments fit
    comfortably; init is once-per-run, so trading dispatches for bounded
    workspace is free."""
    from ..sampler.hmc_real import init_chain_state_real

    keys = jax.random.split(key, n_chains)
    # "ph" inits through the floor-guarded solver: the cold random-Δ
    # spectrum is exactly the regime where near-zero levels (no d-wave
    # gap yet) can sit under the minimax schedule's floor, and the
    # guard's lax.cond must run OUTSIDE the per-chain vmap — so the
    # states are built without eigenpairs and the batch is diagonalized
    # afterwards in one guarded call per chunk
    guarded_ph = exact_solver == "ph"
    init = functools.partial(init_chain_state_real, lat, params,
                             dtype=dtype, n_imp=n_imp,
                             exact_solver=exact_solver,
                             diagonalize=not guarded_ph)
    if init_chunk is None or init_chunk >= n_chains:
        states = jax.vmap(init)(keys)
        if guarded_ph:
            states = _fill_eigs_ph_guarded(lat, params, states)
    else:
        parts = []
        for i in range(0, n_chains, init_chunk):
            part = jax.vmap(init)(keys[i:i + init_chunk])
            if guarded_ph:
                part = _fill_eigs_ph_guarded(lat, params, part)
            parts.append(part)
        states = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                              *parts)
    if mesh is not None:
        states = shard_ensemble(states, mesh)
    return states


@functools.partial(jax.jit, static_argnums=(0,))
def _fill_eigs_ph_guarded(lat, params, states):
    """Batched floor-guarded PH diagonalization of an ensemble's current
    (Δ, disorder) — fills the evals/X/Y leaves (see init_ensemble_real)."""
    from ..models.bdg_real import assemble_embedding, static_embedding
    from ..ops.ph_eigh import diagonalize_embedding_ph_guarded

    def asm(p, s):
        Ms = static_embedding(lat, p.t, p.tp, p.mu, s.disorder)
        return assemble_embedding(lat, Ms, s.delta_re, s.delta_im)

    p_ax = None if jnp.ndim(params.beta) == 0 else 0
    M = jax.vmap(asm, in_axes=(p_ax, 0))(params, states)
    ev, X, Y, _fb = diagonalize_embedding_ph_guarded(M)
    return states._replace(evals=ev, X=X, Y=Y)


def run_segment_real(lat: LatticeSpec, params: ModelParams, states,
                     n_sweeps: int, Nt: int, dt, *, measure: bool = True,
                     params_axis=None, dt_axis=None, eigh_mode="exact",
                     tracked_iters=6):
    """Real-path equivalent of run_segment (complex-free throughout)."""
    from ..models.observables_real import measure_observables_real
    from ..sampler.hmc_real import hmc_sweep_real

    sweep = functools.partial(hmc_sweep_real, lat, Nt=Nt,
                              eigh_mode=eigh_mode,
                              tracked_iters=tracked_iters)
    sweep2 = lambda p, s, d: sweep(p, s, dt=d)  # noqa: E731

    def body(states, _):
        states, info = jax.vmap(sweep2, in_axes=(params_axis, 0, dt_axis))(
            params, states, jnp.asarray(dt))
        if measure:
            obs = jax.vmap(functools.partial(measure_observables_real, lat),
                           in_axes=(params_axis, 0))(params, states)
        else:
            obs = None
        return states, (info.accepted, info.dH, obs)

    states, (acc, dH, obs) = lax.scan(body, states, None, length=n_sweeps)
    return states, SegmentResult(accepted=acc, dH=dH, observables=obs)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8, 9, 10))
def run_segment_real_jit(lat, params, states, n_sweeps, Nt, dt,
                         measure=True, params_axis=None, dt_axis=None,
                         eigh_mode="exact", tracked_iters=6):
    return run_segment_real(lat, params, states, n_sweeps, Nt, dt,
                            measure=measure, params_axis=params_axis,
                            dt_axis=dt_axis, eigh_mode=eigh_mode,
                            tracked_iters=tracked_iters)


# split tracked segment: two programs per sweep, host-sequenced -------------
#
# The target TPU compiler faults when the exact embedding eigh and the
# tracked matmul refinement share one compiled program, so the tracked
# production path dispatches phase 1 (tracked leapfrog) and phase 2 (exact
# anchor + Metropolis + observables) as separate jits per sweep.  Dispatch
# overhead is ~10 ms/call — noise against a multi-hundred-ms sweep.

@functools.partial(jax.jit,
                   static_argnums=(0, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                   15, 16))
def _tracked_leapfrog_jit(lat, params, states, Nt, dt, tracked_iters,
                          params_axis=None, dt_axis=None, refine_iters=0,
                          polish_iters=0, ns_steps=2, rot_dtype=None,
                          polish_precision="highest",
                          polish_correction=False, unroll=1,
                          rot_scheme="ns", use_pallas_s=False):
    from ..sampler.hmc_real import tracked_leapfrog

    fn = lambda p, s, d: tracked_leapfrog(lat, p, s, Nt, d, tracked_iters,  # noqa: E731
                                          refine_iters, polish_iters,
                                          ns_steps, rot_dtype,
                                          polish_precision,
                                          polish_correction, unroll,
                                          rot_scheme, use_pallas_s)
    return jax.vmap(fn, in_axes=(params_axis, 0, dt_axis))(
        params, states, jnp.asarray(dt))


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def _tracked_accept_jit(lat, params, states, proposal, measure=True,
                        params_axis=None, cheap=False,
                        exact_solver="qdwh", dH_host=None, finite_host=None):
    from ..models.observables_real import measure_observables_real
    from ..sampler.hmc_real import tracked_accept, tracked_accept_cheap

    eig_new = None
    if not cheap and exact_solver == "ph":
        # floor-guarded PH anchor (default-safe): the guard's lax.cond
        # fallback to QDWH must sit OUTSIDE the per-chain vmap (a vmapped
        # cond lowers to select and would run BOTH solvers every sweep),
        # so the batch's eigenpairs are computed here and threaded into
        # tracked_accept via eig_new
        from ..models.bdg_real import assemble_embedding, static_embedding
        from ..ops.ph_eigh import diagonalize_embedding_ph_guarded
        from ..sampler.hmc_real import _finite_or_zero

        def asm(p, s, prop):
            Ms = static_embedding(lat, p.t, p.tp, p.mu, s.disorder)
            return assemble_embedding(lat, Ms, _finite_or_zero(prop[0]),
                                      _finite_or_zero(prop[1]))

        M = jax.vmap(asm, in_axes=(params_axis, 0, 0))(
            params, states, proposal)
        ev, X, Y, _fb = diagonalize_embedding_ph_guarded(M)
        eig_new = (ev, X, Y)

    if cheap:
        fn = lambda p, s, prop: tracked_accept_cheap(lat, p, s, prop)  # noqa: E731
        states, info = jax.vmap(fn, in_axes=(params_axis, 0, 0))(
            params, states, proposal)
    elif dH_host is not None:
        fn = lambda p, s, prop, d, f, e: tracked_accept(  # noqa: E731
            lat, p, s, prop, exact_solver, d, f, eig_new=e)
        states, info = jax.vmap(fn, in_axes=(params_axis, 0, 0, 0, 0,
                                             None if eig_new is None else 0)
                                )(params, states, proposal, dH_host,
                                  finite_host, eig_new)
    else:
        fn = lambda p, s, prop, e: tracked_accept(lat, p, s, prop,  # noqa: E731
                                                  exact_solver, eig_new=e)
        states, info = jax.vmap(fn, in_axes=(params_axis, 0, 0,
                                             None if eig_new is None else 0)
                                )(params, states, proposal, eig_new)
    obs = None
    if measure:
        obs = jax.vmap(functools.partial(measure_observables_real, lat),
                       in_axes=(params_axis, 0))(params, states)
    return states, info, obs


@functools.partial(jax.jit,
                   static_argnums=(0, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                   15, 16, 17, 18, 19))
def _tracked_block_jit(lat, params, states, n_cheap, Nt, dt, tracked_iters,
                       refine_iters, measure=True, params_axis=None,
                       dt_axis=None, polish_iters=0, ns_steps=2,
                       rot_dtype=None, final_leapfrog=True,
                       polish_precision="highest", polish_correction=False,
                       unroll=1, rot_scheme="ns", use_pallas_s=False):
    """``n_cheap`` cheap-anchor sweeps + (when ``final_leapfrog``) the
    following (anchor) sweep's leapfrog, fused into ONE program — pure
    matmuls throughout (no eigh, so it is safe on the target compiler),
    cutting host dispatches from 2 per sweep to 2 per ``anchor_every``
    sweeps.  The tunnel's per-call dispatch cost is ~30 ms, comparable to
    a whole cheap sweep's compute, so this fusion roughly doubles
    tracked_fast throughput at 16×16.

    ``final_leapfrog=False`` ends the program after the cheap sweeps
    (proposal is None) — used to chunk long anchor intervals into
    multiple bounded programs: a single program that RUNS too long
    (~90 s at 24×24/b64, i.e. ≳16 fused sweeps) trips the remote
    worker's execution watchdog and crashes it, even though the scan
    keeps the compiled program itself small.

    Returns (states after the cheap sweeps, per-sweep records or None,
    proposal for the anchor sweep to feed _tracked_accept_jit or None).
    """
    from ..models.observables_real import measure_observables_real
    from ..sampler.hmc_real import tracked_accept_cheap, tracked_leapfrog

    dt_arr = jnp.asarray(dt)

    def leapfrog_all(states, r_iters, p_iters):
        fn = lambda p, s, d: tracked_leapfrog(lat, p, s, Nt, d,  # noqa: E731
                                              tracked_iters, r_iters,
                                              p_iters, ns_steps, rot_dtype,
                                              polish_precision,
                                              polish_correction, unroll,
                                              rot_scheme, use_pallas_s)
        return jax.vmap(fn, in_axes=(params_axis, 0, dt_axis))(
            params, states, dt_arr)

    def sweep(states, _):
        proposal = leapfrog_all(states, refine_iters, polish_iters)
        fn = lambda p, s, prop: tracked_accept_cheap(lat, p, s, prop)  # noqa: E731
        states, info = jax.vmap(fn, in_axes=(params_axis, 0, 0))(
            params, states, proposal)
        obs = None
        if measure:
            obs = jax.vmap(functools.partial(measure_observables_real, lat),
                           in_axes=(params_axis, 0))(params, states)
        return states, (info.accepted, info.dH, obs)

    recs = None
    if n_cheap > 0:
        states, recs = lax.scan(sweep, states, None, length=n_cheap)
    if not final_leapfrog:
        return states, recs, None
    proposal = leapfrog_all(states, 0, 0)   # anchor sweep: exact eigh follows
    return states, recs, proposal


def _watchdog_chunk_caps(n_sites: int, batch: int, Nt: int,
                         max_fused: int = 8) -> tuple[int, int]:
    """(cheap-only sweeps/program, cheap sweeps fused with an anchor).

    The 48/54-leapfrog-step program budgets were validated at 24×24/b64
    (embedding dim 2304); per-step cost is matmul-dominated and scales
    like dim³·batch, so at larger shapes the SAME step count overruns the
    remote worker's ~90 s execution watchdog (observed: 32×32/b48 — each
    step ~4.2× the validated cost — kernel-faulted the worker on an
    8-sweep fused chunk that is safe at the validated shape).  The budget
    therefore shrinks by the relative per-step cost; one sweep per
    program is the floor (a single 32×32/b48 sweep is ~19 s — safe)."""
    rel = max(1.0, (n_sites / 576.0) ** 3 * (batch / 64.0))
    step_cap48 = max(Nt, int(48 / rel))
    step_cap54 = max(Nt + 1, int(54 / rel))
    if Nt * rel > 54:
        # even one sweep per program exceeds the validated step budget
        # (e.g. Nt=20 at 32×32 ≈ 70 validated-step-equivalents): the
        # floor below can't chunk finer than a sweep, so the ~90 s device
        # watchdog is at risk — surface it rather than fault silently
        import warnings

        warnings.warn(
            f"single-sweep program is {Nt * rel:.0f} validated-step-"
            f"equivalents (> 54 budget) at n_sites={n_sites}, "
            f"batch={batch}, Nt={Nt}; the remote execution watchdog "
            "(~90 s) may kill it — reduce Nt, batch, or lattice size",
            RuntimeWarning, stacklevel=3)
    return (max(1, min(max_fused, step_cap48 // max(1, Nt))),
            max(0, min(max_fused, step_cap54 // max(1, Nt) - 1)))


def run_segment_tracked(lat, params, states, n_sweeps, Nt, dt,
                        measure=True, params_axis=None, dt_axis=None,
                        tracked_iters=6, anchor_every=1, refine_iters=12,
                        polish_iters=4, ns_steps=2, rot_dtype=None,
                        max_fused=8, exact_solver="qdwh",
                        polish_precision="highest", polish_correction=False,
                        unroll=1, rot_scheme="ns", use_pallas_s=False):
    """Host-sequenced tracked segment; same interface/results shape as
    run_segment_real(eigh_mode="tracked") but crash-safe on the target
    compiler.

    ``anchor_every``: run the exact embedding eigh anchor on every K-th
    sweep only; the sweeps in between use the refined tracked endpoint
    spectrum for Metropolis (``refine_iters`` extra rotations).  K=1 is
    the unbiased default; K>1 trades a controlled, residual-sized energy
    bias for skipping most exact eighs, and runs each K-sweep block as
    one fused matmul program + one anchor program (2 dispatches per K
    sweeps).  The final sweep of the segment is always exact-anchored so
    the carried eigenpairs (used by transport measurement) are exact.

    ``ns_steps``: Newton–Schulz re-unitarization steps per tracked
    rotation (see ops/tracked_eigh.tracked_step); 1 cuts the fast-path
    matmul count per iteration from 21 to 15 at O(σ⁴) unitarity error.

    ``rot_dtype`` (e.g. ``jnp.bfloat16``): storage dtype of the
    in-trajectory rotation matmuls (1.44× the f32 MXU rate measured at
    24×24/b64); endpoint refine+polish stay f32 for Metropolis accuracy.

    ``max_fused``: cap on cheap sweeps fused into one device program.
    Anchor intervals longer than this are split into several bounded
    programs (no anchor between them) — a single program running ≳90 s
    trips the remote worker's execution watchdog (observed: a 19-sweep
    fused block at 24×24/b64 crashed the worker; ≤9 is safe).  Program
    runtime scales with the leapfrog length, so the effective cap is
    also bounded by ~48 total leapfrog steps per program (observed: a
    4-sweep block at Nt=40, ≈160 steps, crashed the worker at the same
    shape where 54 steps were safe).  The budget counts the anchor
    sweep's leapfrog too: the final program of each anchor interval
    holds at most 54//Nt − 1 cheap sweeps, and at large Nt the anchor
    leapfrog runs as its own program rather than exceeding the margin.
    """
    accs, dHs, obss = [], [], []

    def record(acc, dH, obs):
        accs.append(acc)
        dHs.append(dH)
        if measure:
            obss.append(obs)

    if anchor_every <= 1:
        for _ in range(n_sweeps):
            proposal = _tracked_leapfrog_jit(lat, params, states, Nt, dt,
                                             tracked_iters, params_axis,
                                             dt_axis, 0, 0, ns_steps,
                                             rot_dtype, unroll=unroll,
                                             rot_scheme=rot_scheme,
                                             use_pallas_s=use_pallas_s)
            states, info, obs = _tracked_accept_jit(lat, params, states,
                                                    proposal, measure,
                                                    params_axis, False,
                                                    exact_solver)
            record(info.accepted[None], info.dH[None],
                   None if not measure
                   else jax.tree.map(lambda x: x[None], obs))
    else:
        # watchdog-safe chunk sizes: programs are bounded in total leapfrog
        # steps (long-Nt thermalization sweeps are proportionally slower).
        # Cheap-only chunks may carry 48//Nt sweeps; the FINAL program also
        # contains the anchor sweep's leapfrog, so its cheap budget is one
        # sweep smaller against a 54-step total (the observed-safe point:
        # 8 cheap + 1 anchor = 54 steps at Nt=6, 24×24/b64).  When Nt is
        # too large to fuse anything alongside the anchor (54//Nt < 2) the
        # anchor leapfrog is emitted as its own program (n_cheap=0 block),
        # never beyond the validated margin.
        b_sz = jax.tree.leaves(states)[0].shape[0]
        max_chunk, anchor_fused = _watchdog_chunk_caps(
            lat.n_sites, b_sz, Nt, max_fused)
        done = 0
        while done < n_sweeps:
            k = min(anchor_every, n_sweeps - done)   # k-1 cheap + 1 anchored
            n_cheap = k - 1
            # drain cheap sweeps beyond the anchor program's budget into
            # watchdog-safe cheap-only programs
            while n_cheap > anchor_fused:
                c = min(max_chunk, n_cheap - anchor_fused)
                states, recs, _ = _tracked_block_jit(
                    lat, params, states, c, Nt, dt, tracked_iters,
                    refine_iters, measure, params_axis, dt_axis,
                    polish_iters, ns_steps, rot_dtype, False,
                    polish_precision, polish_correction, unroll,
                    rot_scheme, use_pallas_s)
                if recs is not None:
                    record(*recs)
                n_cheap -= c
            states, recs, proposal = _tracked_block_jit(
                lat, params, states, n_cheap, Nt, dt, tracked_iters,
                refine_iters, measure, params_axis, dt_axis, polish_iters,
                ns_steps, rot_dtype, True, polish_precision,
                polish_correction, unroll, rot_scheme, use_pallas_s)
            if recs is not None:
                record(*recs)
            states, info, obs = _tracked_accept_jit(lat, params, states,
                                                    proposal, measure,
                                                    params_axis, False,
                                                    exact_solver)
            record(info.accepted[None], info.dH[None],
                   None if not measure
                   else jax.tree.map(lambda x: x[None], obs))
            done += k

    acc = jnp.concatenate(accs)
    dH = jnp.concatenate(dHs)
    obs = (jax.tree.map(lambda *xs: jnp.concatenate(xs), *obss)
           if measure else None)
    return states, SegmentResult(accepted=acc, dH=dH, observables=obs)


def _hostacc_fingerprint(params, disorder, delta_re, delta_im,
                         params_axis) -> str:
    """Identity+state fingerprint for the host-readout potential cache.

    Disorder alone is NOT sufficient: on a clean lattice (n_imp=0, the
    reference's β-scan config, scripts/batch_scan_beta.jl:10-13) every
    equal-sized chain subset has the identical all-zeros disorder vector,
    and the bucketed thermalization hands different subsets — at
    different β — through the same cache (ADVICE r3, high).  Hash the Δ
    field bytes and the per-chain couplings too; all of these are stable
    across back-to-back segments of the same chains, so cross-segment
    caching still works.
    """
    import hashlib

    h = hashlib.sha1()
    h.update(b"ax0" if params_axis == 0 else b"axN")
    h.update(np.ascontiguousarray(disorder).tobytes())
    h.update(np.ascontiguousarray(delta_re).tobytes())
    h.update(np.ascontiguousarray(delta_im).tobytes())
    for leaf in (params.beta, params.J, params.t, params.tp, params.mu,
                 params.mass):
        h.update(np.asarray(leaf, np.float64).tobytes())
    return h.hexdigest()


def run_segment_hostacc(lat, params, states, n_sweeps, Nt, dt, *,
                        measure=True, params_axis=None, dt_axis=None,
                        tracked_iters=6, ns_steps=2, rot_dtype=None,
                        exact_solver="qdwh", pot_cache=None,
                        rot_scheme="ns", use_pallas_s=False):
    """Tracked segment with the host-f64 Metropolis readout
    (ops/host_energy.py) — for β beyond the f32 conditioning wall
    (β ≳ 3e3), where on-device dH noise of order β·√(2N)·2e-7·‖M‖
    collapses acceptance regardless of dt.

    Per sweep: the tracked leapfrog runs on-device as usual; the tiny
    endpoint (Δ, π) leaves come to the host, which evaluates the exact
    f64 Hamiltonian (complex128 ``eigvalsh`` of the 2N×2N BdG matrix) and
    hands the per-chain ΔH back to the accept program.  The exact anchor
    eigh still runs on-device so the carried eigenpairs stay anchor-grade
    for forces/observables/transport.  The potential of the CURRENT state
    is cached in ``pot_cache`` (a dict) and updated on accept — pass the
    returned dict back in across segments.  The cache self-validates
    against a fingerprint of the chain IDENTITY AND STATE — disorder,
    the Δ field bytes, and the per-chain couplings (β/J/t/t'/μ/m) — so
    handing it a different chain subset OR the same-shaped subset at
    different parameters (the scan driver's bucketed thermalization on a
    clean lattice, where every disorder vector is all-zeros) safely
    triggers a recompute.  On return the stored fingerprint is refreshed
    to the final state, so passing the dict straight back in across
    segments still hits.

    Returns (states, SegmentResult, pot_cache).  Inherently one dispatch
    pair per sweep (decisions are sequential on the host), so use it for
    the extreme-β tail, not as the default production path.
    """
    from ..ops.host_energy import (
        kinetic_energy_np,
        mass_array_np,
        potential_batch_np,
    )

    disorder = np.asarray(states.disorder)
    b = disorder.shape[0]
    mass = mass_array_np(params, b, params_axis=params_axis)
    fp = _hostacc_fingerprint(params, disorder,
                              np.asarray(states.delta_re),
                              np.asarray(states.delta_im), params_axis)
    if pot_cache is None:
        pot_cache = {}
    if pot_cache.get("fp") != fp:
        pot_cache = {"fp": fp, "pot": potential_batch_np(
            lat, params, disorder, np.asarray(states.delta_re),
            np.asarray(states.delta_im), params_axis=params_axis)}

    accs, dHs, obss = [], [], []
    for _ in range(n_sweeps):
        proposal = _tracked_leapfrog_jit(lat, params, states, Nt, dt,
                                         tracked_iters, params_axis,
                                         dt_axis, 0, 0, ns_steps, rot_dtype,
                                         rot_scheme=rot_scheme,
                                         use_pallas_s=use_pallas_s)
        dre, dim_, pre, pim, pi0r, pi0i = (np.asarray(proposal[i])
                                           for i in range(6))
        pot_new = potential_batch_np(lat, params, disorder, dre, dim_,
                                     params_axis=params_axis)
        kin_new = kinetic_energy_np(pre, pim, mass)
        kin_old = kinetic_energy_np(pi0r, pi0i, mass)
        dH = (kin_new + pot_new) - (kin_old + pot_cache["pot"])
        finite = np.isfinite(dH) & np.isfinite(pot_new)
        states, info, obs = _tracked_accept_jit(
            lat, params, states, proposal, measure, params_axis, False,
            exact_solver, jnp.asarray(dH.astype(np.float32)),
            jnp.asarray(finite))
        acc = np.asarray(info.accepted)
        pot_cache["pot"] = np.where(acc, pot_new, pot_cache["pot"])
        accs.append(jnp.asarray(acc)[None])
        dHs.append(jnp.asarray(dH.astype(np.float32))[None])
        if measure:
            obss.append(jax.tree.map(lambda x: x[None], obs))

    acc = jnp.concatenate(accs)
    dH = jnp.concatenate(dHs)
    obs = (jax.tree.map(lambda *xs: jnp.concatenate(xs), *obss)
           if measure else None)
    # Refresh the fingerprint to the FINAL state so the very same cache
    # dict hits on the next segment of these chains (accepts moved Δ).
    pot_cache["fp"] = _hostacc_fingerprint(params, disorder,
                                           np.asarray(states.delta_re),
                                           np.asarray(states.delta_im),
                                           params_axis)
    return states, SegmentResult(accepted=acc, dH=dH,
                                 observables=obs), pot_cache


# jit wrappers with static structure args ------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8))
def run_segment_jit(lat, params, states, n_sweeps, Nt, dt,
                    measure=True, params_axis=None, dt_axis=None):
    return run_segment(lat, params, states, n_sweeps, Nt, dt,
                       measure=measure, params_axis=params_axis,
                       dt_axis=dt_axis)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ensemble_transport_jit(lat, spec, params, states, params_axis=None):
    return ensemble_transport(lat, spec, params, states,
                              params_axis=params_axis)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ensemble_transport_real_jit(lat, spec, params, states, params_axis=None):
    from ..models.transport_real import measure_transport_and_spectra_real

    fn = functools.partial(measure_transport_and_spectra_real, lat, spec)
    return jax.vmap(fn, in_axes=(params_axis, 0))(params, states)
