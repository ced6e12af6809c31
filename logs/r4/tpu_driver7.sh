#!/bin/bash
# Round-4 TPU queue #7 — per-preset throughput rows for the new plants.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE6" "$LOG/driver6.log" 2>/dev/null; do sleep 30; done

bench() {
  local name=$1; shift
  echo "=== bench $name: $* $(date +%T)"
  timeout 3000 env "$@" python -u bench.py > "$LOG/bench_$name.json" 2> "$LOG/bench_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/bench_$name.json" 2>/dev/null
}

bench pendulum_b8192  BENCH_PRESET=pendulum BENCH_BATCH=8192
bench tank3_b8192     BENCH_PRESET=tank3 BENCH_BATCH=8192
bench tank_mimo_b8192 BENCH_PRESET=tank_mimo BENCH_BATCH=8192

echo "ALL DONE7 $(date +%T)"
