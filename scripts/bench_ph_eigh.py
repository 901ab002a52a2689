#!/usr/bin/env python
"""Race the PH-split eigensolver against XLA's QDWH eigh on the BdG
embedding shapes (VERDICT r2 anchor: QDWH (8,1024,1024) = 259 ms,
0.30 TFLOP/s effective; target >= 5x).

Usage: python scripts/bench_ph_eigh.py [--L 16 --batch 8 --reps 3]
Writes one JSON line per configuration to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree.leaves(x)[0][..., :1])


def build_batch(L, batch, seed=0):
    from dwavehmc_tpu.models import bdg_real
    from dwavehmc_tpu.models.lattice import LatticeSpec

    lat = LatticeSpec(L, L)
    N = lat.n_sites

    def one(key):
        k1, k2, k3 = jax.random.split(key, 3)
        dis = jax.random.uniform(k1, (N,), minval=-0.5, maxval=0.5)
        dre = jax.random.normal(k2, (N, 2)) * 0.05 + 0.04
        dim_ = jax.random.normal(k3, (N, 2)) * 0.05
        return bdg_real.assemble_embedding(
            lat, bdg_real.static_embedding(lat, 1.0, -0.35, -1.08, dis),
            dre, dim_)

    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    return jax.vmap(one)(keys).astype(jnp.float32)


def time_fn(fn, M, reps):
    out = fn(M)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(M)
        sync(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--n_lift", type=int, default=None,
                   help="fixed-coefficient lift steps; default = the "
                        "8-step minimax schedule")
    p.add_argument("--orth", default="chol")
    p.add_argument("--lift_prec", default="high",
                   choices=("default", "high", "highest"))
    p.add_argument("--skip_qdwh", action="store_true")
    p.add_argument("--floor", type=float, default=1e-5,
                   help="spectral floor |E|min/||M|| selecting the "
                        "minimax lift schedule (1e-3 is 40%% shorter)")
    ns = p.parse_args()

    from dwavehmc_tpu.models.bdg_real import diagonalize_embedding
    from dwavehmc_tpu.ops.ph_eigh import diagonalize_embedding_ph

    M = build_batch(ns.L, ns.batch)
    sync(M)
    dim = M.shape[-1]
    print(f"shapes: ({ns.batch},{dim},{dim})", file=sys.stderr)

    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[ns.lift_prec]

    ph = jax.jit(lambda m: diagonalize_embedding_ph(
        m, n_lift=ns.n_lift, orth=ns.orth, lift_precision=prec,
        floor=ns.floor))
    t_ph, out_ph = time_fn(ph, M, ns.reps)
    print(f"ph: {t_ph*1e3:.1f} ms", file=sys.stderr)

    res = {"shape": [ns.batch, dim, dim], "ph_ms": t_ph * 1e3,
           "n_lift": ns.n_lift, "orth": ns.orth, "lift_prec": ns.lift_prec,
           "floor": ns.floor}

    if not ns.skip_qdwh:
        qdwh = jax.jit(diagonalize_embedding)
        t_q, out_q = time_fn(qdwh, M, ns.reps)
        print(f"qdwh: {t_q*1e3:.1f} ms", file=sys.stderr)
        ev_err = float(jnp.max(jnp.abs(out_ph[0] - out_q[0])))
        res.update(qdwh_ms=t_q * 1e3, speedup=t_q / t_ph, eval_err=ev_err)
    else:
        # untimed QDWH reference so eval_err is still reported
        out_q = jax.jit(diagonalize_embedding)(M)
        sync(out_q)
        res["eval_err"] = float(jnp.max(jnp.abs(out_ph[0] - out_q[0])))

    # residual check on device: ||M v - w v|| per column, worst case
    w, X, Y = out_ph
    V = jnp.concatenate([X, Y], axis=-2)
    R = jnp.matmul(M, V, precision=jax.lax.Precision.HIGHEST) \
        - V * w[..., None, :]
    res["max_res_colnorm"] = float(
        jnp.max(jnp.linalg.norm(R, axis=-2)))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
