#!/bin/bash
set -u
cd /root/repo
LOG=logs/r4
bench() {
  local name=$1; shift
  echo "=== bench $name: $* $(date +%T)"
  timeout 2800 env "$@" python -u bench.py > "$LOG/bench_$name.json" 2> "$LOG/bench_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/bench_$name.json" 2>/dev/null
}
validate() {
  local name=$1; shift
  echo "=== validate $name: $* $(date +%T)"
  timeout 2800 env "$@" python -u tools/validate_scale.py > "$LOG/val_$name.json" 2> "$LOG/val_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/val_$name.json" 2>/dev/null
}
bench rff_b8192    BENCH_PRESET=duffing_rff BENCH_BATCH=8192
bench rff_b8192_k8 BENCH_PRESET=duffing_rff BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0
validate rff_k8    PRESET=duffing_rff STEPS=3000 W_REFIT_EVERY=8
echo "ALL DONE15 $(date +%T)"
