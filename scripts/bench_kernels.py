#!/usr/bin/env python
"""Kernel microbenchmarks: assembly, eigensolvers, forces, transport
(rebuild of scripts/test_hamiltonian.jl's @btime study + bench_forces.jl,
extended to the TPU kernel variants).

Times, per variant and batch size:
  * BdG assembly (complex) vs real-embedding assembly
  * exact eigh: complex vs real embedding
  * tracked refinement (per iteration)
  * force kernel, transport |J_mn|²
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def timeit(fn, *args, reps=5):
    """Times ``jit(sum-reduced fn)``: every output leaf is reduced to a
    scalar INSIDE the program, so the device→host sync transfers a few
    bytes.  (Syncing on the raw output instead measures tunnel transfer
    time on this remote backend — a (64,2304,2304) f32 output is 1.3 GB
    and dominated the apparent cost of every large-output variant.)"""
    import jax.numpy as jnp

    red = jax.jit(lambda *a: [jnp.sum(x) for x in jax.tree.leaves(fn(*a))])
    out = red(*args)
    _ = np.asarray(out[0])                    # compile + true sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = red(*args)
    _ = np.asarray(out[0])
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--skip", nargs="*", default=[],
                   help="variants to skip (e.g. complex on the axon TPU)")
    from dwavehmc_tpu.utils.platform import add_platform_arg, force_platform
    add_platform_arg(p)
    ns = p.parse_args()
    force_platform(ns.platform or ("cpu" if ns.dtype == "float64" else None))
    if ns.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from dwavehmc_tpu import LatticeSpec, make_params
    from dwavehmc_tpu.models.bdg import assemble_bdg, static_hamiltonian
    from dwavehmc_tpu.models.bdg_real import (
        assemble_embedding, assemble_parts, diagonalize_embedding,
        static_embedding,
    )
    from dwavehmc_tpu.models.transport_real import current_J2_real
    from dwavehmc_tpu.ops.forces_real import hmc_forces_real
    from dwavehmc_tpu.ops.tracked_eigh import tracked_eigh_nofallback
    from dwavehmc_tpu.parallel.ensemble import init_ensemble_real

    dtype = jnp.float64 if ns.dtype == "float64" else jnp.float32
    lat = LatticeSpec(ns.L, ns.L)
    b = ns.batch
    params = make_params(W=1.0, n_imp=0.05, beta=10.0, J=0.8, dtype=dtype)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), b,
                                dtype=dtype, n_imp=0.05)
    print(f"device={jax.devices()[0]} L={ns.L} (2N={lat.dim}) batch={b} "
          f"dtype={ns.dtype}")

    def report(name, fn, *args):
        if any(s in name for s in ns.skip):
            print(f"{name:34s}: skipped")
            return
        try:
            t = timeit(fn, *args, reps=ns.reps)
            print(f"{name:34s}: {t*1e3:9.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s}: FAILED {type(e).__name__}: {str(e)[:60]}")

    Ms = jax.vmap(lambda w: static_embedding(lat, params.t, params.tp,
                                             params.mu, w))(states.disorder)

    report("assemble embedding (real 4N)",
           jax.jit(jax.vmap(lambda m, dr, di: assemble_embedding(lat, m, dr, di))),
           Ms, states.delta_re, states.delta_im)

    Hs = jax.vmap(lambda w: static_hamiltonian(lat, params.t, params.tp,
                                               params.mu, w))(states.disorder)
    report("assemble parts (real 2N pair)",
           jax.jit(jax.vmap(lambda h, dr, di: assemble_parts(lat, h, dr, di))),
           Hs, states.delta_re, states.delta_im)

    report("exact eigh (real embedding 4N)",
           jax.jit(jax.vmap(lambda m, dr, di: diagonalize_embedding(
               assemble_embedding(lat, m, dr, di))[0])),
           Ms, states.delta_re, states.delta_im)

    if "complex" not in ns.skip:
        delta_c = states.delta_re + 1j * states.delta_im
        report("exact eigh (complex 2N)",
               jax.jit(jax.vmap(lambda h, d: jnp.linalg.eigh(
                   assemble_bdg(lat, h, d))[0])),
               Hs, delta_c)

    # raw 3-mult complex matmul — the MXU workhorse of the tracked step
    # (one tracked_step iteration = 7 cmm's = 21 real matmuls); comparing
    # 7×cmm against "tracked refine n_iter=1" isolates the elementwise
    # (VPU) overhead of the rotation-angle construction.
    from dwavehmc_tpu.ops.tracked_eigh import cmm

    def raw_cmm(X, Y):
        ar, ai = cmm(X, Y, X, Y)
        return ar + ai

    t_cmm = None
    try:
        t_cmm = timeit(jax.jit(jax.vmap(raw_cmm)), states.X, states.Y,
                       reps=ns.reps)
        n = lat.dim
        tf = 3 * 2.0 * n**3 * b / t_cmm / 1e12
        print(f"{'raw cmm (3 real matmuls)':34s}: {t_cmm*1e3:9.2f} ms "
              f"({tf:.1f} TFLOP/s)")
    except Exception as e:  # noqa: BLE001
        print(f"{'raw cmm (3 real matmuls)':34s}: FAILED "
              f"{type(e).__name__}: {str(e)[:60]}")

    for it in (1, 4, 8):
        report(f"tracked refine n_iter={it}",
               jax.jit(jax.vmap(lambda h, dr, di, X, Y: tracked_eigh_nofallback(
                   *assemble_parts(lat, h, dr, di), X, Y, n_iter=it)[0]),
                   ),
               Hs, states.delta_re, states.delta_im, states.X, states.Y)

    report("force kernel (real pairs)",
           jax.jit(jax.vmap(lambda dr, di, e, X, Y: hmc_forces_real(
               lat, dr, di, e, X, Y, 10.0, 0.8)[0])),
           states.delta_re, states.delta_im, states.evals,
           states.X, states.Y)

    report("transport |J_mn|^2 (6 matmuls)",
           jax.jit(jax.vmap(lambda X, Y: current_J2_real(lat, X, Y, 1.0, -0.35))),
           states.X, states.Y)


if __name__ == "__main__":
    main()
