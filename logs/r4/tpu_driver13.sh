#!/bin/bash
set -u
cd /root/repo
LOG=logs/r4
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

# shorter Schulz chain at large lift: at (129,129) the chain is MXU work,
# and the round-3 "filter 12 fails the tank warm-up" result was a tiny-
# lift phenomenon — re-test at the new shape
bench rbf128_b1024_u1_k8_f12 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=1024 BENCH_UNROLL=1 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0 BENCH_W_FILTER=12
validate rbf128_f12    PRESET=duffing_rbf128 STEPS=3000 W_FILTER=12
validate rbf128_k8_f12 PRESET=duffing_rbf128 STEPS=3000 W_REFIT_EVERY=8 W_FILTER=12

echo "ALL DONE13 $(date +%T)"
