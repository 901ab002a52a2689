#!/usr/bin/env python
"""TPU backend diagnostics: capability matrix + latency/throughput probes.

The targeted TPU runtime (remote-tunneled PJRT) has sharp edges this
framework designs around; this tool verifies them on the current backend:

 * complex dtypes: unsupported at execution time (→ real-pair path)
 * float64: unsupported (→ CPU oracle path)
 * per-call dispatch latency: ~10 ms (→ jit whole segments, not steps)
 * block_until_ready may not actually block (→ sync via tiny transfers)
 * eigh on non-finite input: hard worker crash (→ NaN guards in sweeps)
   — NOT probed by default; pass --crash-test only on a disposable worker

Usage: python scripts/diagnose_tpu.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="skip throughput probes (capability matrix only)")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})")

    def probe(tag, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            _ = [np.asarray(x) for x in jax.tree.leaves(out)]
            print(f"  {tag:38s} OK   ({time.perf_counter()-t0:.2f}s)")
            return True
        except Exception as e:  # noqa: BLE001
            print(f"  {tag:38s} FAIL {type(e).__name__}: {str(e)[:50]}")
            return False

    print("capability matrix:")
    probe("f32 elementwise", lambda: jnp.arange(8.0) * 2)
    probe("f32 matmul 256", lambda: jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    probe("f32 eigh 128",
          lambda: jnp.linalg.eigh(jnp.eye(128) + 0.1)[0])
    probe("bf16 matmul 256",
          lambda: (jnp.ones((256, 256), jnp.bfloat16)
                   @ jnp.ones((256, 256), jnp.bfloat16)).astype(jnp.float32))
    probe("c64 elementwise",
          lambda: (jnp.ones((8, 8), jnp.complex64) * 0.3).real)
    probe("c64 eigh 32",
          lambda: jnp.linalg.eigh(jnp.eye(32, dtype=jnp.complex64))[0])
    probe("f64 elementwise", lambda: jnp.arange(8.0, dtype=jnp.float64) * 2)
    probe("scatter-add", lambda: jnp.zeros((64, 64)).at[
        jnp.arange(8), jnp.arange(8)].add(1.0))
    probe("argsort+gather 512",
          lambda: jnp.ones((512, 512))[:, jnp.argsort(jnp.arange(512.0))])

    if ns.quick:
        return

    print("latency / throughput:")
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a + 1)
    _ = np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(f(x))
    print(f"  round-trip dispatch+transfer: "
          f"{(time.perf_counter()-t0)/10*1e3:.1f} ms")

    A = jnp.ones((1024, 1024))
    from jax import lax

    @jax.jit
    def mm50(a):
        return lax.scan(lambda c, _: (a @ c * 1e-3, None), a, None,
                        length=50)[0]
    _ = np.asarray(mm50(A)[0, 0])
    t0 = time.perf_counter()
    _ = np.asarray(mm50(A)[0, 0])
    dt = time.perf_counter() - t0
    print(f"  in-program matmul 1024³ ×50: {dt*1e3:.1f} ms "
          f"→ {50*2*1024**3/dt/1e12:.2f} TFLOP/s f32")


if __name__ == "__main__":
    main()
