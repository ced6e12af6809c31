#!/bin/bash
# Round-4 sequential TPU measurement queue (one chip; run detached).
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

# 1) tank schedule sweep at batch 8192 — steady-state throughput, so the
#    warm-up (always-refit) phase is disabled for the 200-step scan
bench tank_base BENCH_PRESET=tank BENCH_BATCH=8192
bench tank_k2   BENCH_PRESET=tank BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=2 BENCH_W_FILTER_WARMUP=0
bench tank_k4   BENCH_PRESET=tank BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=4 BENCH_W_FILTER_WARMUP=0
bench tank_k8   BENCH_PRESET=tank BENCH_BATCH=8192 BENCH_W_REFIT_EVERY=8 BENCH_W_FILTER_WARMUP=0

# 2) tank correctness: full 3000-step f32 loop with cadence (warm-up
#    default 300 steps keeps the validated always-refit transient)
validate tank_k2 PRESET=tank STEPS=3000 W_REFIT_EVERY=2
validate tank_k4 PRESET=tank STEPS=3000 W_REFIT_EVERY=4
validate tank_k8 PRESET=tank STEPS=3000 W_REFIT_EVERY=8

# 3) large-lift bench rows (nlift=128)
bench rbf128_b1024 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=1024
bench rbf128_b4096 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=4096

# 4) new n=3 plant at reference length
validate tank3 PRESET=tank3 STEPS=3000

# 5) serving latency-vs-program-size curve
echo "=== serving curve $(date +%T)"
timeout 3000 python -u tools/bench_serving.py --curve > "$LOG/serving_curve.json" 2> "$LOG/serving_curve.err"
echo "--- exit $? $(date +%T)"; cat "$LOG/serving_curve.json" 2>/dev/null

echo "ALL DONE $(date +%T)"
