#!/bin/bash
# Round-5 chip queue 5 (waits for queue 4): STORE_GRAW re-bench.
set -u
cd /root/repo
Q=runs/r5/queue5.log
while ! grep -q "queue4 done" runs/r5/queue4.log 2>/dev/null; do sleep 120; done
echo "=== queue5 start $(date) ===" >> $Q
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=4 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_shape_elasto_v3.json 2> runs/r5/bench_shape_elasto_v3.log
echo "se v3 rc=$?" >> $Q
echo "=== queue5 done $(date) ===" >> $Q
