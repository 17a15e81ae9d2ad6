#!/bin/bash
# Round-5+ scaling-run orchestrator: the round-4 "watcher" pattern, scripted.
#
# The host's own 4->16 pure-CPU scaling varies with neighbor load
# (0.715-0.965 measured across round-4 probes), so each scaling run is
# gated on a fresh ceiling probe: probe, and only if the host itself can
# scale >= $MIN_CEILING right now, fire the next pending leg.  Otherwise
# sleep and re-probe.  Every probe and run is appended to $OUT so the
# report can cite the in-window ceiling next to each result.
#
# Legs (in order): lean build, FULL-artifact build (SCALING_DERIVED=1),
# FULL+combo2 (SCALING_COMBO2=1, 1 round — prices the round-5 C(14,2)
# band-table write's scaling separately).
#
# Usage: TMPDIR=/dev/shm SPARK_LOCAL_DIRS=/dev/shm/spark \
#        bash BENCH/run_scaling.sh [n_docs] [out_dir]
set -u
N_DOCS="${1:-300000}"
OUT="${2:-/tmp/scaling_r5}"
MIN_CEILING="${MIN_CEILING:-0.88}"
MAX_WAIT_PROBES="${MAX_WAIT_PROBES:-12}"   # after this many bad probes, run anyway (best window seen)
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

probe() {
    python BENCH/cpu_ceiling.py 4 16 2 2>/dev/null | tail -1
}

run_leg() { # $1 = name, $2 = rounds, $3.. = extra env (VAR=val)
    local name="$1" rounds="$2"; shift 2
    echo "[$(date -u +%H:%M:%S)] firing $name (rounds=$rounds; env: $*)" | tee -a "$OUT/log.txt"
    env "$@" python BENCH/scaling.py "$N_DOCS" 4 16 "$rounds" \
        > "$OUT/$name.json" 2>"$OUT/$name.err"
    echo "[$(date -u +%H:%M:%S)] $name done: $(tail -c 400 "$OUT/$name.json")" | tee -a "$OUT/log.txt"
}

wait_for_window() { # blocks until ceiling >= MIN_CEILING or patience runs out
    local waited=0
    while true; do
        local p eff
        p=$(probe)
        eff=$(echo "$p" | python -c "import json,sys; print(json.load(sys.stdin)['ceiling_efficiency'])")
        echo "[$(date -u +%H:%M:%S)] ceiling probe: $p" | tee -a "$OUT/log.txt"
        echo "$p" >> "$OUT/ceilings.jsonl"
        if python -c "import sys; sys.exit(0 if float('$eff') >= float('$MIN_CEILING') else 1)"; then
            return 0
        fi
        waited=$((waited + 1))
        if [ "$waited" -ge "$MAX_WAIT_PROBES" ]; then
            echo "[$(date -u +%H:%M:%S)] patience exhausted ($waited probes) — running in current window" | tee -a "$OUT/log.txt"
            return 0
        fi
        sleep 240
    done
}

wait_for_window
run_leg lean 2

wait_for_window
run_leg full 2 SCALING_DERIVED=1

wait_for_window
run_leg full_combo2 1 SCALING_DERIVED=1 SCALING_COMBO2=1

probe >> "$OUT/ceilings.jsonl"
echo "[$(date -u +%H:%M:%S)] all legs complete" | tee -a "$OUT/log.txt"
