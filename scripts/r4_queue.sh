#!/bin/bash
# Round-4 TPU queue #1: symmetric fold_cloth3 parity record (VERDICT item 3).
# Reference shim at seeds 1..3, max_it 300, same protocol as the r3 seed-0 run
# (runs/r3/reference_fold_cloth3.jsonl) and as our 4-seed sweep.
set -u
cd /root/repo
mkdir -p runs/r4
for S in 1 2 3; do
  echo "=== reference fold_cloth3 seed $S start $(date +%s) ===" >> runs/r4/queue.log
  timeout 3600 python scripts/reference_baseline_run.py \
    --env fold_cloth3 --max_it 300 --seed $S \
    --out runs/r4/reference_fold_cloth3_s$S.jsonl \
    > runs/r4/reference_fold_cloth3_s$S.log 2>&1
  echo "=== seed $S rc=$? done $(date +%s) ===" >> runs/r4/queue.log
done
echo "QUEUE1 DONE $(date +%s)" >> runs/r4/queue.log
