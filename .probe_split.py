"""Fine-grained TPU probe of the split tracked sweep (run when ALIVE)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from dwavehmc_tpu import LatticeSpec, make_params, calc_optimal_dt
from dwavehmc_tpu.parallel.ensemble import (
    _tracked_accept_jit, _tracked_leapfrog_jit, init_ensemble_real,
    run_segment_real_jit,
)

lat = LatticeSpec(16, 16)
beta, J = 10.0, 0.8
params = make_params(W=1.0, n_imp=0.05, beta=beta, J=J, dtype=jnp.float32)
states = init_ensemble_real(lat, params, jax.random.PRNGKey(0), 8,
                            dtype=jnp.float32, n_imp=0.05)
_ = np.asarray(states.evals[:, :1])
print("init ok", flush=True)

# thermalize a bit (exact mode, known good)
dt_th = calc_optimal_dt(beta, J, 1.0, 20)
states, seg = run_segment_real_jit(lat, params, states, 3, 20, dt_th,
                                   False, None)
_ = np.asarray(seg.accepted)
print("therm ok", flush=True)

dt = calc_optimal_dt(beta, J, 1.0, 6)

t0 = time.time()
prop = _tracked_leapfrog_jit(lat, params, states, 6, dt, 6, None, None)
_ = np.asarray(prop[-1])   # residual
print(f"phase1 leapfrog ok {time.time()-t0:.1f}s res={np.asarray(prop[-1])}",
      flush=True)

t0 = time.time()
states2, info, obs = _tracked_accept_jit(lat, params, states, prop,
                                         False, None)
_ = np.asarray(info.accepted)
print(f"phase2 accept(no measure) ok {time.time()-t0:.1f}s "
      f"acc={np.asarray(info.accepted).tolist()}", flush=True)

t0 = time.time()
states3, info, obs = _tracked_accept_jit(lat, params, states, prop,
                                         True, None)
_ = np.asarray(obs.total_energy)
print(f"phase2 accept(measure) ok {time.time()-t0:.1f}s", flush=True)

# full 5-sweep split segment ×2
from dwavehmc_tpu.parallel.ensemble import run_segment_tracked
for rep in range(2):
    t0 = time.time()
    states3, seg = run_segment_tracked(lat, params, states3, 5, 6, dt,
                                       True, None, None, 6)
    _ = np.asarray(seg.accepted)
    print(f"segment rep{rep} ok {time.time()-t0:.2f}s "
          f"acc={np.asarray(seg.accepted).mean():.2f}", flush=True)
print("ALL OK", flush=True)
