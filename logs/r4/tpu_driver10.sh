#!/bin/bash
# Round-4 TPU queue #10 — fleet HIL + tank_mimo real-time operating point.
set -u
cd /root/repo
LOG=logs/r4

hil() {
  local name=$1; shift
  echo "=== hil $name: $* $(date +%T)"
  timeout 3000 python -u tools/bench_hil.py "$@" > "$LOG/hil_$name.json" 2> "$LOG/hil_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/hil_$name.json" 2>/dev/null
}
bench() {
  local name=$1; shift
  echo "=== bench $name: $* $(date +%T)"
  timeout 3000 env "$@" python -u bench.py > "$LOG/bench_$name.json" 2> "$LOG/bench_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/bench_$name.json" 2>/dev/null
}

hil fleet256_tank  --preset tank --fleet 256 --steps 400
hil fleet4096_tank --preset tank --fleet 4096 --steps 400

bench tank_mimo_b4096 BENCH_PRESET=tank_mimo BENCH_BATCH=4096
bench tank_mimo_b2048 BENCH_PRESET=tank_mimo BENCH_BATCH=2048

echo "ALL DONE10 $(date +%T)"
