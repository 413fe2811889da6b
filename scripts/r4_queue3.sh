#!/bin/bash
# Round-4 TPU queue #3 (waits for queue #2): identification record (item 8),
# PPO shape_rope training record (item 7), fresh bench.py sanity.
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "QUEUE2 DONE" runs/r4/queue.log 2>/dev/null; do sleep 60; done
echo "=== queue3 start $(date +%s) ===" >> runs/r4/queue.log

timeout 7200 python scripts/r4_identify.py > runs/r4/identify.log 2>&1
echo "identify rc=$?" >> runs/r4/queue.log

PPO_ITERS=300 PPO_NUM_ENVS=64 timeout 10800 python scripts/r4_ppo.py \
  > runs/r4/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> runs/r4/queue.log

timeout 3600 python bench.py > runs/r4/bench_check.json 2> runs/r4/bench_check.log
echo "bench rc=$?" >> runs/r4/queue.log

echo "QUEUE3 DONE $(date +%s)" >> runs/r4/queue.log
