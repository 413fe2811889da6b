#!/bin/bash
# Round-4 TPU queue #6 (waits for queue #5): rerun reference fold_cloth3
# seed 2 — the first attempt wedged when a host-RAM-heavy CPU compile
# starved the axon tunnel (killed at it 180; see runs/r4/queue.log).
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "QUEUE5 DONE" runs/r4/queue.log 2>/dev/null; do sleep 60; done
echo "=== queue6 start $(date +%s) ===" >> runs/r4/queue.log

rm -f runs/r4/reference_fold_cloth3_s2.jsonl
timeout 3600 python scripts/reference_baseline_run.py \
  --env fold_cloth3 --max_it 300 --seed 2 \
  --out runs/r4/reference_fold_cloth3_s2.jsonl \
  > runs/r4/reference_fold_cloth3_s2_retry.log 2>&1
echo "seed2 retry rc=$?" >> runs/r4/queue.log

echo "QUEUE6 DONE $(date +%s)" >> runs/r4/queue.log
