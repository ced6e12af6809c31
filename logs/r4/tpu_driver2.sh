#!/bin/bash
# Round-4 follow-up TPU queue — chained after tpu_driver.sh completes.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE" "$LOG/driver.log" 2>/dev/null; do sleep 30; done

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

# baseline k=1 for the cadence comparison (same tool, same scenario)
validate tank_base PRESET=tank STEPS=3000 W_REFIT_EVERY=1

# the new pendulum plant at reference length, production f32 recipe
validate pendulum PRESET=pendulum STEPS=2000

# large-lift at the headline batch (HBM probe; failure is a result too)
bench rbf128_b8192 BENCH_PRESET=duffing_rbf128 BENCH_BATCH=8192

# HIL serving loop on the real chip (native C++ plant outside the graph)
echo "=== hil pendulum $(date +%T)"
timeout 2000 python -u tools/bench_hil.py --preset pendulum --steps 600 > "$LOG/hil_pendulum.json" 2> "$LOG/hil_pendulum.err"
echo "--- exit $? $(date +%T)"; cat "$LOG/hil_pendulum.json" 2>/dev/null
echo "=== hil tank $(date +%T)"
timeout 2000 python -u tools/bench_hil.py --preset tank --steps 600 > "$LOG/hil_tank.json" 2> "$LOG/hil_tank.err"
echo "--- exit $? $(date +%T)"; cat "$LOG/hil_tank.json" 2>/dev/null

# graft entry single-chip compile check
echo "=== graft entry $(date +%T)"
timeout 2000 python -u __graft_entry__.py > "$LOG/graft_entry.log" 2>&1
echo "--- exit $? $(date +%T)"; tail -2 "$LOG/graft_entry.log"

echo "ALL DONE2 $(date +%T)"
