#!/bin/bash
# Supervise a long TPU run against wedged-client stalls.
#
# Observed failure mode (2026-08-20): the remote TPU worker blips, the
# worker itself recovers in minutes, but the CLIENT's in-flight device
# call never returns — the python process sleeps on a futex forever.
# Checkpoint+resume makes the run restartable, so the right supervisor is
# mtime-based: if the run's log/CSV output goes quiet for too long while
# the process is alive, kill it (by PID — never by pattern) and relaunch;
# the driver resumes from its checkpoint.
#
# Usage:
#   bash scripts/run_with_watchdog.sh <watch_file> <stale_seconds> \
#        <max_restarts> -- <command...>
#
# <watch_file> must be touched regularly by the command (e.g. the scan's
# scan.log).  First-compile windows are long: pick stale_seconds well
# above the worst compile you expect (default guidance: 1500).
set -u
WATCH=$1; STALE=$2; MAX_RESTARTS=$3; shift 3
[ "$1" = "--" ] && shift

attempt=0
while :; do
    attempt=$((attempt + 1))
    # setsid: run the command in its own process group so the kill below
    # reaps any subprocesses too — a surviving wedged child would violate
    # the one-process-per-TPU constraint when the next attempt launches
    setsid "$@" &
    PID=$!
    echo "[watchdog] attempt $attempt: pid $PID (pgid $PID)" >&2
    while kill -0 "$PID" 2>/dev/null; do
        sleep 60
        if [ -f "$WATCH" ]; then
            age=$(( $(date +%s) - $(stat -c %Y "$WATCH") ))
            if [ "$age" -gt "$STALE" ]; then
                echo "[watchdog] $WATCH quiet ${age}s > ${STALE}s — " \
                     "killing pgid $PID for resume" >&2
                kill -- "-$PID" 2>/dev/null || kill "$PID" 2>/dev/null
                sleep 5
                kill -9 -- "-$PID" 2>/dev/null || kill -9 "$PID" 2>/dev/null
                break
            fi
        fi
    done
    wait "$PID" 2>/dev/null
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[watchdog] done (rc=0, $attempt attempt(s))" >&2
        exit 0
    fi
    if [ "$attempt" -ge "$MAX_RESTARTS" ]; then
        echo "[watchdog] giving up after $attempt attempts (rc=$rc)" >&2
        exit "$rc"
    fi
    echo "[watchdog] rc=$rc — relaunching (resume path)" >&2
    sleep 30
done
