#!/bin/bash
# Round-4 TPU queue #4 — chained after tpu_driver3.sh.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE3" "$LOG/driver3.log" 2>/dev/null; do sleep 30; done

validate() {
  local name=$1; shift
  echo "=== validate $name: $* $(date +%T)"
  timeout 3000 env "$@" python -u tools/validate_scale.py > "$LOG/val_$name.json" 2> "$LOG/val_$name.err"
  echo "--- exit $? $(date +%T)"; cat "$LOG/val_$name.json" 2>/dev/null
}

# every-step-refit baseline for the cadence comparison (the tank preset
# now defaults to window_refit_every=8, so force k=1 explicitly)
validate tank_k1 PRESET=tank STEPS=3000 W_REFIT_EVERY=1

echo "ALL DONE4 $(date +%T)"
