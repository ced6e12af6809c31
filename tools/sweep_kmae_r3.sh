#!/bin/bash
# Round-3 KMAE sweep: beat the reference encoder's 0.0391 open-loop RMSE
# (VERDICT item 1). Validation selection uses PRNGKey(3); the reported
# test rollout stays PRNGKey(2).
cd /root/repo
L=logs/kmae_sweep
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" 
  timeout 4000 python -u tools/train_reference_scale.py --tag "$tag" "$@" \
    > "$L/$tag.log" 2>&1
  tail -1 "$L/$tag.log" >> "$L/summary.jsonl"
}
run r3a --epochs 40 --rec-only-after none --cosine-final 0.01 --seed 0 --val-select --eval-every 4
run r3b --epochs 40 --rec-only-after none --cosine-final 0.01 --seed 1 --val-select --eval-every 4
run r3c --epochs 40 --rec-only-after 30 --cosine-final 0.01 --seed 0 --val-select --eval-every 4
run r3d --epochs 40 --rec-only-after none --cosine-final 0.01 --seed 2 --val-select --eval-every 4
echo DONE_SWEEP
