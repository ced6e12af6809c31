#!/bin/bash
# Round-4 TPU queue #6 — chained after tpu_driver5.sh.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE5" "$LOG/driver5.log" 2>/dev/null; do sleep 30; done

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

# does the tank's refit cadence generalize to the large lift?
bench rbf128_b1024_u1_k8 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=1024 BENCH_UNROLL=1 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0
validate rbf128_base PRESET=duffing_rbf128 STEPS=3000
validate rbf128_k8 PRESET=duffing_rbf128 STEPS=3000 W_REFIT_EVERY=8

# headline duffing re-confirmation with the args-not-closures bench.py
bench duffing_headline BENCH_BATCH=8192

# new plants at reference length on the chip
validate tank_mimo PRESET=tank_mimo STEPS=3000

echo "ALL DONE6 $(date +%T)"
