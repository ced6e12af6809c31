#!/bin/bash
# Round-4 TPU queue #5 — kernel re-check at the large-lift shape (n=129),
# the re-evaluation trigger the round-3 negatives reserved.
set -u
cd /root/repo
LOG=logs/r4

while ! grep -q "ALL DONE4" "$LOG/driver4.log" 2>/dev/null; do sleep 30; done

for b in 1024 4096; do
  echo "=== spd_inverse n=129 B=$b $(date +%T)"
  timeout 3000 env B=$b N=129 python -u tools/bench_spd_inverse.py \
    > "$LOG/spd_129_b$b.log" 2>&1
  echo "--- exit $? $(date +%T)"; cat "$LOG/spd_129_b$b.log"
done

echo "ALL DONE5 $(date +%T)"
