#!/bin/bash
set -u
cd /root/repo
LOG=logs/r4
echo "=== validate duffing_rff windowed $(date +%T)"
timeout 3000 env PRESET=duffing_rff STEPS=3000 python -u tools/validate_scale.py > "$LOG/val_duffing_rff_w.json" 2> "$LOG/val_duffing_rff_w.err"
echo "--- exit $? $(date +%T)"; cat "$LOG/val_duffing_rff_w.json" 2>/dev/null
echo "ALL DONE12 $(date +%T)"
