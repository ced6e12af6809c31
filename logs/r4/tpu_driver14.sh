#!/bin/bash
set -u
cd /root/repo
LOG=logs/r4
while ! grep -q "ALL DONE13" "$LOG/driver13.log" 2>/dev/null; do sleep 30; done
echo "=== profile rbf128 b1024 $(date +%T)"
timeout 3000 env BENCH_PRESET=duffing_rbf128 BENCH_BATCH=1024 BENCH_STEPS=50 \
  python -u tools/profile_step.py > "$LOG/profile_rbf128.log" 2>&1
echo "--- exit $? $(date +%T)"; tail -25 "$LOG/profile_rbf128.log"
echo "ALL DONE14 $(date +%T)"
