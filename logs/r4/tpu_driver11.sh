#!/bin/bash
set -u
cd /root/repo
LOG=logs/r4
echo "=== validate duffing_rff $(date +%T)"
timeout 3000 env PRESET=duffing_rff STEPS=3000 python -u tools/validate_scale.py > "$LOG/val_duffing_rff.json" 2> "$LOG/val_duffing_rff.err"
echo "--- exit $? $(date +%T)"; cat "$LOG/val_duffing_rff.json" 2>/dev/null
echo "ALL DONE11 $(date +%T)"
