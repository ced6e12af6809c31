#!/bin/bash
# Round-4 TPU queue #3 — chained after tpu_driver2.sh.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE2" "$LOG/driver2.log" 2>/dev/null; do sleep 30; done

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

# rbf128 with unroll=1: the unroll-8 body at nlift=128 exceeds the
# remote-compile tunnel's request-size limit (HTTP 413)
bench rbf128_b1024_u1 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=1024 BENCH_UNROLL=1
bench rbf128_b4096_u1 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=4096 BENCH_UNROLL=1
bench rbf128_b8192_u1 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=8192 BENCH_UNROLL=1

# cadence robustness: plant switch at step 1500, far past warm-up, so the
# re-adaptation itself runs at the k=8 cadence
validate tank_k8_late PRESET=tank STEPS=3000 SWITCH=1500

echo "ALL DONE3 $(date +%T)"
