#!/usr/bin/env python
"""BASELINE config 5: disorder-averaged 32x32 ensemble, >=64 realizations
across the TPU mesh (BASELINE.json configs[4]).

Two modes:

* ``--mode mesh`` (default; run under JAX_PLATFORMS=cpu +
  XLA_FLAGS=--xla_force_host_platform_device_count=8): proves the
  64-realization sharded layout three ways —
   1. the production tracked-sweep and transport programs COMPILE at the
      full config-5 shapes (64 chains x 32x32, embedding dim 4096)
      sharded over the 8-device mesh (jit lower+compile, no execution:
      the full-shape arithmetic is TPU-sized, not CPU-sized),
   2. the identical code path EXECUTES end-to-end at a reduced lattice
      (64 chains x 12x12 on the same mesh) with per-chain disorder,
   3. the HBM plan from utils/memory is recorded: 8 chains/chip at
      32x32 needs ~1.9 GiB of 16 GiB — 64 realizations fit a v5e-8
      with >8x headroom.
  Writes examples/config5_mesh_demo.json.

* ``--mode tpu``: measures single-chip 32x32 throughput at the largest
  batch the HBM plan allows (the perf anchor for the multi-chip claim).
  Writes examples/config5_tpu_32x32.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def sync(tree):
    import jax
    import numpy as np

    np.asarray(jax.tree.leaves(tree)[0][..., :1])


def mesh_demo(out_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import SpectralSpec, make_params
    from dwavehmc_tpu.parallel.ensemble import (
        _tracked_accept_jit,
        _tracked_leapfrog_jit,
        ensemble_transport_real_jit,
        init_ensemble_real,
        make_mesh,
        run_segment_tracked,
        shard_ensemble,
    )
    from dwavehmc_tpu.sampler.hmc_real import HMCStateReal
    from dwavehmc_tpu.utils.memory import estimate_memory, max_chains

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"
    mesh = make_mesh()
    B = 64
    report = {"devices": n_dev, "chains": B}

    # --- 1. full-shape SPMD compile: 64 x 32x32 over the mesh -----------
    L = 32
    lat = LatticeSpec(L, L)
    N = lat.n_sites
    d2 = 2 * N
    sh = NamedSharding(mesh, P("chain"))
    f32 = jnp.float32

    def sds(shape):
        return jax.ShapeDtypeStruct(shape, f32, sharding=sh)

    states = HMCStateReal(
        delta_re=sds((B, N, 2)), delta_im=sds((B, N, 2)),
        pi_re=sds((B, N, 2)), pi_im=sds((B, N, 2)),
        disorder=sds((B, N)), evals=sds((B, d2)),
        X=sds((B, d2, d2)), Y=sds((B, d2, d2)),
        key=jax.ShapeDtypeStruct((B, 2), jnp.uint32, sharding=sh))
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=20.0, J=0.8, mass=1.0)
    dt = sds((B,))

    t0 = time.time()
    lf = _tracked_leapfrog_jit.lower(lat, params, states, 6, dt, 6,
                                     None, 0, 12, 4, 2, None).compile()
    report["leapfrog_compile_s"] = round(time.time() - t0, 1)
    # accept program (exact anchor, includes the embedding eigh); the
    # proposal pytree shapes come from abstract evaluation, re-annotated
    # with the chain sharding
    prop_shapes = jax.eval_shape(_tracked_leapfrog_jit, lat, params,
                                 states, 6, dt, 6, None, 0, 12, 4, 2, None)
    prop_sds = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(
            l.shape, l.dtype,
            sharding=sh if (l.ndim >= 1 and l.shape[0] == B) else None),
        prop_shapes)
    t0 = time.time()
    acc = _tracked_accept_jit.lower(lat, params, states, prop_sds,
                                    True, None, False, "qdwh").compile()
    report["accept_compile_s"] = round(time.time() - t0, 1)
    spec = SpectralSpec(eta=8.0 / (L * L), domega=0.2 * 8.0 / (L * L),
                        omega_max=4.0)
    t0 = time.time()
    tr = ensemble_transport_real_jit.lower(lat, spec, params, states,
                                           None).compile()
    report["transport_compile_s"] = round(time.time() - t0, 1)
    report["full_shape"] = {"L": L, "chains": B, "embedding_dim": 2 * d2,
                            "compiled": ["tracked_leapfrog",
                                         "tracked_accept(eigh)",
                                         "transport"]}
    print(f"full-shape SPMD compile ok: {report}", file=sys.stderr)

    # --- 2. execute the same path at a reduced lattice ------------------
    Lr = 12
    lat_r = LatticeSpec(Lr, Lr)
    st = init_ensemble_real(lat_r, params, jax.random.PRNGKey(0), B,
                            dtype=f32, n_imp=0.05)
    st = shard_ensemble(st, mesh)
    dt_r = jnp.full((B,), 0.02, dtype=f32)
    t0 = time.time()
    st, seg = run_segment_tracked(lat_r, params, st, 2, 4, dt_r,
                                  True, None, 0)
    sync(st)
    acc_mean = float(np.asarray(seg.accepted).mean())
    # per-chain disorder must be distinct realizations
    dis = np.asarray(st.disorder)
    n_distinct = len({dis[i].tobytes() for i in range(B)})
    report["reduced_exec"] = {
        "L": Lr, "sweeps": 2, "acceptance": acc_mean,
        "distinct_disorder_realizations": n_distinct,
        "wall_s": round(time.time() - t0, 1),
        "state_sharding": str(jax.tree.leaves(st)[0].sharding)}
    assert n_distinct == B
    print(f"reduced exec ok: acc={acc_mean:.2f}", file=sys.stderr)

    # --- 3. HBM plan -----------------------------------------------------
    est8 = estimate_memory(lat, 8)           # 8 chains per chip
    report["hbm_plan"] = {
        "per_chain_mib": round(est8.per_chain_bytes / 2**20, 1),
        "chains_per_chip_8": round(est8.total_bytes / 2**30, 2),
        "max_chains_per_chip": max_chains(lat),
        "note": ("64 realizations of 32x32 = 8 chains/chip on a v5e-8: "
                 f"{est8.total_bytes/2**30:.2f} GiB of 16 GiB per chip")}

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"config5_mesh_demo": "ok", **report["hbm_plan"]}))


def mesh_exec_demo(out_path, batch, sweeps):
    """EXECUTE (not just compile) the sharded ensemble at the FULL config-5
    lattice (32×32, embedding dim 4096) over the 8-virtual-device CPU mesh
    (VERDICT r3 item 7).  The arithmetic is TPU-sized, so this runs a
    small batch (default 8 = 1 chain/device) for a few cheap-anchor
    sweeps — the point is that the production sharded program (leapfrog +
    accept + per-chain disorder) executes end-to-end at full L, exercising
    the same collectives/sharding the real v5e-8 run would."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real,
        make_mesh,
        run_segment_tracked,
        shard_ensemble,
    )
    from dwavehmc_tpu.sampler.hmc import calc_optimal_dt

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"
    mesh = make_mesh()
    L = 32
    lat = LatticeSpec(L, L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=20.0, J=0.8, mass=1.0)
    t0 = time.time()
    st = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                            dtype=jnp.float32, n_imp=0.05)
    st = shard_ensemble(st, mesh)
    sync(st)
    t_init = time.time() - t0
    print(f"init done ({t_init:.0f}s)", file=sys.stderr)
    Nt = 2
    dt = jnp.full((batch,), calc_optimal_dt(20.0, 0.8, 1.0, 6),
                  dtype=jnp.float32)
    t0 = time.time()
    # cheap-anchor mode (anchor_every > sweeps): no exact 4096-eigh in the
    # accept — the same production fast path the single-chip bench runs
    st, seg = run_segment_tracked(lat, params, st, sweeps, Nt, dt, False,
                                  None, 0, 6, sweeps + 1, 12, 4, 2, None)
    acc = np.asarray(seg.accepted)
    wall = time.time() - t0
    dis = np.asarray(st.disorder)
    n_distinct = len({dis[i].tobytes() for i in range(batch)})
    res = {"L": L, "batch": batch, "devices": n_dev, "sweeps": sweeps,
           "Nt": Nt, "acceptance": round(float(acc.mean()), 3),
           "dH_finite": bool(np.isfinite(np.asarray(seg.dH)).all()),
           "distinct_disorder_realizations": n_distinct,
           "init_wall_s": round(t_init, 1), "exec_wall_s": round(wall, 1),
           "state_sharding": str(jax.tree.leaves(st)[0].sharding),
           "note": ("full-L (embedding 4096) sharded EXECUTION on the "
                    "8-virtual-device CPU mesh; TPU-sized arithmetic on "
                    "one host CPU, hence the small batch/sweep count")}
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"config5_mesh_exec": res}))


def mesh64_demo(out_path, batch=64, L=32):
    """The FULL config-5 layout executed end-to-end (VERDICT r4 item 7):
    ``batch`` (default 64) chains of L=32 — 8 chains per device on the
    8-virtual-device CPU mesh — through init (chunked QDWH), one
    cheap-anchor tracked sweep, and the transport/spectra measurement,
    asserting sharding, 64 distinct disorder realizations, and finiteness
    of every output.

    The arithmetic is TPU-sized (embedding dim 4096 × 64 chains) running
    on one host CPU, so the knobs are trimmed to what finishes in ~an
    hour: Nt=1, tracked_iters=2, refine=2/polish=1, and a coarse spectral
    grid (the production η = 8/N grid at this shape is ~7e14 Lorentzian
    ops — CPU-infeasible; grid size changes no program structure).  The
    layout, sharded programs and collectives are exactly the v5e-8 run's.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import SpectralSpec, make_params
    from dwavehmc_tpu.parallel.ensemble import (
        ensemble_transport_real_jit,
        init_ensemble_real,
        make_mesh,
        run_segment_tracked,
        shard_ensemble,
    )
    from dwavehmc_tpu.sampler.hmc import calc_optimal_dt

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"
    mesh = make_mesh()
    lat = LatticeSpec(L, L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=20.0, J=0.8, mass=1.0)
    t0 = time.time()
    st = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                            dtype=jnp.float32, n_imp=0.05, init_chunk=8)
    st = shard_ensemble(st, mesh)
    sync(st)
    t_init = time.time() - t0
    print(f"init done ({t_init:.0f}s)", file=sys.stderr)

    Nt = 1
    dt = jnp.full((batch,), calc_optimal_dt(20.0, 0.8, 1.0, 6),
                  dtype=jnp.float32)
    t0 = time.time()
    st, seg = run_segment_tracked(lat, params, st, 1, Nt, dt, False,
                                  None, 0, 2, 2, 2, 1, 2, None)
    acc = np.asarray(seg.accepted)
    t_sweep = time.time() - t0
    print(f"sweep done ({t_sweep:.0f}s)", file=sys.stderr)

    spec = SpectralSpec(eta=0.05, domega=0.05, omega_max=2.0)
    t0 = time.time()
    spectra = ensemble_transport_real_jit(lat, spec, params, st, None)
    rho = np.asarray(spectra.superfluid_stiffness)
    sig = np.asarray(spectra.optical_conductivity)
    ak = np.asarray(spectra.A_k0)
    t_meas = time.time() - t0
    print(f"transport done ({t_meas:.0f}s)", file=sys.stderr)

    dis = np.asarray(st.disorder)
    res = {"L": L, "batch": batch, "devices": n_dev,
           "chains_per_device": batch // n_dev,
           "Nt": Nt, "acceptance": round(float(acc.mean()), 3),
           "dH_finite": bool(np.isfinite(np.asarray(seg.dH)).all()),
           "distinct_disorder_realizations":
               len({dis[i].tobytes() for i in range(batch)}),
           "rho_s_shape": list(rho.shape),
           "rho_s_finite": bool(np.isfinite(rho).all()),
           "sigma_finite": bool(np.isfinite(sig).all()),
           "A_k0_finite": bool(np.isfinite(ak).all()),
           "state_sharding": str(jax.tree.leaves(st)[0].sharding),
           "spectra_sharding": str(spectra.superfluid_stiffness.sharding),
           "init_wall_s": round(t_init, 1),
           "sweep_wall_s": round(t_sweep, 1),
           "transport_wall_s": round(t_meas, 1),
           "note": ("full config-5 layout (>=64 realizations of 32x32, "
                    "8 chains/device) EXECUTED end-to-end on the "
                    "8-virtual-device CPU mesh; knobs trimmed for CPU "
                    "feasibility — program structure identical to the "
                    "v5e-8 run")}
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"config5_mesh_64": res}))


def tpu_demo(out_path, batch, sweeps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real,
        run_segment_tracked,
    )
    from dwavehmc_tpu.sampler.hmc import calc_optimal_dt
    from dwavehmc_tpu.utils.memory import estimate_memory

    L = 32
    lat = LatticeSpec(L, L)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=20.0, J=0.8, mass=1.0)
    est = estimate_memory(lat, batch)
    print(f"HBM estimate: {est}", file=sys.stderr)
    st = init_ensemble_real(lat, params, jax.random.PRNGKey(0), batch,
                            dtype=jnp.float32, n_imp=0.05,
                            init_chunk=8)   # bounded QDWH workspace
    sync(st)
    print("init done", file=sys.stderr)
    # thermalize first (cold random starts have huge dH — a timed segment
    # at acc 0.0 is not a perf anchor): Nt=20 exact-anchored sweeps at the
    # therm heuristic dt, as bench.py does
    Nt_th = 20
    dt_th = jnp.full((batch,), calc_optimal_dt(20.0, 0.8, 1.0, Nt_th),
                     dtype=jnp.float32)
    st, seg = run_segment_tracked(lat, params, st, 10, Nt_th, dt_th,
                                  False, None, 0, 6)
    acc_th = float(np.asarray(seg.accepted).mean())
    print(f"therm acc={acc_th:.2f}", file=sys.stderr)
    Nt = 6
    dt = jnp.full((batch,), calc_optimal_dt(20.0, 0.8, 1.0, Nt),
                  dtype=jnp.float32)
    # warmup + timed segments (cheap-anchor production mode, K=5)
    st, seg = run_segment_tracked(lat, params, st, 2, Nt, dt, False, None,
                                  0, 6, 5, 12, 4, 2, None)
    sync(seg.accepted)
    t0 = time.time()
    st, seg = run_segment_tracked(lat, params, st, sweeps, Nt, dt, False,
                                  None, 0, 6, 5, 12, 4, 2, None)
    acc = np.asarray(seg.accepted)
    wall = time.time() - t0
    res = {"L": L, "batch": batch, "Nt": Nt, "sweeps": sweeps,
           "traj_per_sec": round(batch * sweeps / wall, 2),
           "acceptance": round(float(acc.mean()), 3),
           "therm_acceptance": round(acc_th, 2),
           "wall_s": round(wall, 1),
           "hbm_est_gib": round(est.total_bytes / 2**30, 2)}
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"config5_tpu_32x32": res}))


def main():
    from dwavehmc_tpu.utils.quickcheck import run_quick_suite
    run_quick_suite()

    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("mesh", "mesh_exec", "mesh64", "tpu"),
                   default="mesh")
    p.add_argument("--batch", type=int, default=None)   # tpu: 48, mesh_exec: 8
    p.add_argument("--sweeps", type=int, default=None)  # tpu: 10, mesh_exec: 2
    p.add_argument("--L", type=int, default=None)       # mesh64: 32
    p.add_argument("--out", default=None)
    ns = p.parse_args()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if ns.mode == "mesh64":
        from dwavehmc_tpu.utils.platform import force_platform
        force_platform("cpu")
        mesh64_demo(ns.out or os.path.join(here, "examples",
                                           "config5_mesh_64.json"),
                    ns.batch or 64, ns.L or 32)
    elif ns.mode == "mesh":
        from dwavehmc_tpu.utils.platform import force_platform
        force_platform("cpu")
        mesh_demo(ns.out or os.path.join(here, "examples",
                                         "config5_mesh_demo.json"))
    elif ns.mode == "mesh_exec":
        from dwavehmc_tpu.utils.platform import force_platform
        force_platform("cpu")
        mesh_exec_demo(ns.out or os.path.join(here, "examples",
                                              "config5_mesh_exec.json"),
                       ns.batch or 8, ns.sweeps or 2)
    else:
        tpu_demo(ns.out or os.path.join(here, "examples",
                                        "config5_tpu_32x32.json"),
                 ns.batch or 48, ns.sweeps or 10)


if __name__ == "__main__":
    main()
