"""Headline benchmark: HMC trajectories/sec/chip at 16×16 (BASELINE.json metric).

Runs a batch of independent disordered 16×16 chains (2N = 512 BdG matrices)
in float32 on one chip, times jit-compiled measurement segments, and prints
ONE JSON line.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
anchor is an estimate of the reference's single-chain CPU throughput at the
same shape: MKL zheevd on a 512×512 complex Hermitian matrix ≈ 20 ms on a
modern many-core CPU, ×Nt=6 per trajectory plus O(N²) forces ⇒ ≈ 7
trajectories/sec.  (Documented estimate, not a measured number.)

Env knobs: BENCH_BATCH (default 8), BENCH_L (default 16), BENCH_NT (6),
BENCH_SWEEPS (10), BENCH_REPS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.parallel.ensemble import init_ensemble, run_segment_jit

REFERENCE_CPU_TRAJ_PER_SEC = 7.0


def main():
    batch = int(os.environ.get("BENCH_BATCH", 8))
    L = int(os.environ.get("BENCH_L", 16))
    Nt = int(os.environ.get("BENCH_NT", 6))
    sweeps = int(os.environ.get("BENCH_SWEEPS", 10))
    reps = int(os.environ.get("BENCH_REPS", 3))

    lat = LatticeSpec(L, L)
    beta, J, mass = 10.0, 0.8, 1.0
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=1.0, n_imp=0.05,
                         beta=beta, J=J, mass=mass, dtype=jnp.float32)
    states = init_ensemble(lat, params, jax.random.PRNGKey(0), batch,
                           dtype=jnp.float32, n_imp=0.05)
    dt = calc_optimal_dt(beta, J, mass, Nt)

    # warmup / compile
    states, seg = run_segment_jit(lat, params, states, sweeps, Nt, dt,
                                  True, None)
    jax.block_until_ready(states.delta)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        states, seg = run_segment_jit(lat, params, states, sweeps, Nt, dt,
                                      True, None)
        jax.block_until_ready(states.delta)
        times.append(time.perf_counter() - t0)

    best = min(times)
    traj_per_sec = batch * sweeps / best
    acc = float(np.mean(np.asarray(seg.accepted)))
    print(json.dumps({
        "metric": f"hmc_trajectories_per_sec_per_chip_{L}x{L}_b{batch}_Nt{Nt}",
        "value": round(traj_per_sec, 3),
        "unit": "traj/s",
        "vs_baseline": round(traj_per_sec / REFERENCE_CPU_TRAJ_PER_SEC, 3),
        "acceptance": round(acc, 3),
        "device": str(jax.devices()[0]),
        "times_s": [round(t, 4) for t in times],
    }))


if __name__ == "__main__":
    main()
