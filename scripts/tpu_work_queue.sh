#!/bin/bash
# Drain the round-3 TPU-gated task queue once the tunneled worker is back.
#
# The remote axon worker has been down since ~22:24 UTC; every task below
# is blocked on it.  This script probes with a bounded-timeout matmul,
# waits while the worker is dead, and runs the queue serially (only ONE
# process may touch the TPU).  Each task is individually timed out and
# failure-isolated; the probe re-runs between tasks so a mid-queue worker
# crash parks the queue instead of hanging it.
#
# Usage: bash scripts/tpu_work_queue.sh [max_wait_minutes]
cd "$(dirname "$0")/.." || exit 1
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue.log}
MAX_WAIT_MIN=${1:-180}
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
    timeout 420 python - <<'EOF' >>"$LOG" 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe-ok", float(np.asarray(x @ x)[0, 0]), jax.devices()[0])
EOF
}

wait_for_tpu() {
    local waited=0
    while ! probe; do
        say "worker still down (waited ${waited}m)"
        if [ "$waited" -ge "$MAX_WAIT_MIN" ]; then
            say "giving up after ${waited}m"
            return 1
        fi
        sleep 300
        waited=$((waited + 7))   # 5 min sleep + ~2 min probe timeout
    done
    say "worker is UP"
}

run_task() {
    local name=$1 tmo=$2; shift 2
    wait_for_tpu || return 1
    say "START $name"
    if timeout "$tmo" "$@" >>"$LOG" 2>&1; then
        say "DONE  $name"
    else
        say "FAIL  $name (rc=$?)"
    fi
}

say "=== queue start (max wait ${MAX_WAIT_MIN}m) ==="

# 1. PH vs QDWH exact-eigh race at the VERDICT anchor shape (8,1024,1024)
run_task bench_ph_eigh_16 4800 python scripts/bench_ph_eigh.py --L 16 --batch 8 --reps 3

# 2. Same at the production dimension (8,2304,2304)
run_task bench_ph_eigh_24 5400 python scripts/bench_ph_eigh.py --L 24 --batch 8 --reps 2

# 3. Deep-cold beta validation: 12x12 at beta = 1e4 / 1e5 (VERDICT item 8)
run_task validate_beta_extreme 5400 python scripts/validate_beta_extreme.py

# 4. jax.profiler trace of the production 24x24/b64 segment (VERDICT item 5)
run_task profile_production 5400 python scripts/profile_production.py

# 5. Config-5 perf anchor: 32x32 at batch 16 on the real chip
run_task demo_32x32_b16 5400 env DEMO_BATCH=16 DEMO_SWEEPS=10 python scripts/demo_32x32.py

# 6. Refresh the headline bench (compiles now cached)
run_task bench 5400 python bench.py

say "=== queue end ==="
