#!/bin/bash
# Round-4 TPU queue #9 — refit cadence on the new windowed presets.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE8" "$LOG/driver8.log" 2>/dev/null; do sleep 30; done

bench() {
  local name=$1; shift
  echo "=== bench $name: $* $(date +%T)"
  timeout 3000 env "$@" python -u bench.py > "$LOG/bench_$name.json" 2> "$LOG/bench_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/bench_$name.json" 2>/dev/null
}
validate() {
  local name=$1; shift
  echo "=== validate $name: $* $(date +%T)"
  timeout 3000 env "$@" python -u tools/validate_scale.py > "$LOG/val_$name.json" 2> "$LOG/val_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/val_$name.json" 2>/dev/null
}

bench tank3_b8192_k8     BENCH_PRESET=tank3 BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0
bench tank_mimo_b8192_k8 BENCH_PRESET=tank_mimo BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0
bench pendulum_b8192_k8  BENCH_PRESET=pendulum BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0

validate tank3_k8     PRESET=tank3 STEPS=3000 W_REFIT_EVERY=8
validate tank_mimo_k8 PRESET=tank_mimo STEPS=3000 W_REFIT_EVERY=8
validate pendulum_k8  PRESET=pendulum STEPS=2000 W_REFIT_EVERY=8

echo "ALL DONE9 $(date +%T)"
