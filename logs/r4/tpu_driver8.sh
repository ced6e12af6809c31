#!/bin/bash
# Round-4 TPU queue #8 — spd-inverse kernel re-check at n=129 (retry with
# the args-not-closures loop_time).
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE7" "$LOG/driver7.log" 2>/dev/null; do sleep 30; done

for b in 1024 4096; do
  echo "=== spd_inverse n=129 B=$b $(date +%T)"
  timeout 3000 env B=$b N=129 python -u tools/bench_spd_inverse.py \
    > "$LOG/spd_129_b$b.log" 2>&1
  echo "--- exit $? $(date +%T)"; cat "$LOG/spd_129_b$b.log"
done

echo "ALL DONE8 $(date +%T)"
