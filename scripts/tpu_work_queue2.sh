#!/bin/bash
# Follow-up TPU queue (runs after tpu_work_queue.sh drains):
#  * endpoint-polish A/B at the headline shape and at production shape,
#  * the reference's SECOND production workload at full spec: the β scan
#    (scripts/batch_scan_beta.jl:10-36 shape — 12×12 clean, 24 log-spaced
#    β ∈ [0.01, 1e5], 20 therm + 100 measure sweeps, transport every
#    sweep, bin 10) as an examples/ artifact.
# Usage: bash scripts/tpu_work_queue2.sh [max_wait_minutes]
cd "$(dirname "$0")/.." || exit 1
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue2.log}
MAX_WAIT_MIN=${1:-120}
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
DEAD=0

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
        say "worker down (waited ${waited}m)"
        if [ "$waited" -ge "$MAX_WAIT_MIN" ]; then
            say "giving up; marking queue dead"
            DEAD=1
            return 1
        fi
        sleep 300
        waited=$((waited + 7))
    done
}

run_task() {
    local name=$1 tmo=$2; shift 2
    [ "$DEAD" = 1 ] && { say "SKIP  $name (worker dead)"; return 1; }
    if [ -f /tmp/tpu_queue_stop ]; then
        say "SKIP  $name (stop file present)"; return 1
    fi
    if [ -f /tmp/tpu_queue2_deadline ]; then
        local now left
        now=$(date +%s)
        left=$(( $(cat /tmp/tpu_queue2_deadline) - now ))
        if [ "$left" -lt 300 ]; then
            say "SKIP  $name (past deadline — freeing the TPU for the round-end bench)"
            return 1
        fi
        [ "$left" -lt "$tmo" ] && tmo=$left   # never run past the deadline
    fi
    wait_for_tpu || return 1
    say "START $name"
    if timeout "$tmo" "$@" >>"$LOG" 2>&1; then
        say "DONE  $name"
    else
        say "FAIL  $name (rc=$?)"
    fi
}

say "=== queue2 start ==="

# Priority order: validation + full-spec artifacts first, A/B experiments
# last (skippable at the deadline).

# host-f64 Metropolis readout validation at the reference beta-grid top
# (the device-f32 readout measurably FAILS here: acc 0.20-0.39 —
# examples/beta_extreme_validation_device_readout.json)
run_task validate_beta_extreme_host 4200 python scripts/validate_beta_extreme.py

# the reference's SECOND production workload at full spec, with the exact
# host readout so the top beta decades sit inside the acceptance window
run_task beta_scan_full 9000 python scripts/batch_scan_beta.py \
    --out_dir examples/beta_scan_full_12x12 --replicas 3 \
    --eigh_mode tracked --anchor_every 1 --checkpoint_freq 10 \
    --resume true --mode vectorized --metropolis_readout host

# cold tail of the full-spec T-scan (the 6 coldest grid points, beta >=
# 300, where the device readout sat at acc 0.44-0.60) re-run with the
# host readout; the 6-point log grid reproduces the full grid's points
run_task T_scan_cold_host 7200 python scripts/batch_scan_T.py \
    --out_dir examples/T_scan_cold_host_24x24 --replicas 3 \
    --n_T 6 --T_min 1e-4 --T_max 0.0033246 \
    --eigh_mode tracked --anchor_every 1 --checkpoint_freq 10 \
    --resume true --mode vectorized --metropolis_readout host

# PH-solver accuracy/speed frontier at the production shape: is the
# dim-2304 eval_err 2.75e-3 / res 0.18 (lift_prec=high) the HIGH-pass
# matmul noise?  highest costs ~2x on the lift phase only.
run_task bench_ph_eigh_24_highest 3600 python scripts/bench_ph_eigh.py \
    --L 24 --batch 8 --reps 2 --lift_prec highest --skip_qdwh

# shallow minimax schedule (floor 1e-3, 6 steps = 40% fewer lift
# matmuls) — valid when the spectral floor allows it
run_task bench_ph_eigh_24_floor1e3 3600 python scripts/bench_ph_eigh.py \
    --L 24 --batch 8 --reps 2 --floor 1e-3 --skip_qdwh

# PH anchors in the production pipeline: acceptance is a direct anchor-
# quality probe (Metropolis reads the anchor spectra), throughput shows
# the ~20%-of-wall anchor share shrinking.  Compare BENCH_LOCAL.json
# production_24x24 (qdwh: 14.5 traj/s acc 0.91 at K=20-chunked).
run_task bench_prod24_ph_anchors 5400 env BENCH_L=24 BENCH_BATCH=64 \
    BENCH_NT=6 BENCH_SWEEPS=20 BENCH_REPS=2 BENCH_SKIP_EIGH=1 \
    BENCH_MODES=tracked,tracked_fast BENCH_ANCHOR_EVERY=10 \
    BENCH_EXACT_SOLVER=ph python bench.py

# leapfrog-scan unroll A/B: the trace shows 9.8% of device self-time in
# while-loop bookkeeping (examples/profile_production.json analysis)
run_task bench_prod24_unroll 5400 env BENCH_L=24 BENCH_BATCH=64 \
    BENCH_NT=6 BENCH_SWEEPS=20 BENCH_REPS=2 BENCH_SKIP_EIGH=1 \
    BENCH_MODES=tracked_fast BENCH_ANCHOR_EVERY=10 \
    BENCH_LEAPFROG_UNROLL=6 python bench.py

run_task ab_polish_16 5400 python scripts/ab_polish.py

run_task ab_polish_24_b64 5400 env AB_L=24 AB_BATCH=64 AB_PAIRED=3 \
    AB_SWEEPS=10 python scripts/ab_polish.py

say "=== queue2 end ==="
