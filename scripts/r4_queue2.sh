#!/bin/bash
# Round-4 TPU queue #2 (waits for queue #1 = reference seed runs):
# big-grid kernel true-res parity + throughput rows (VERDICT items 1, 2).
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "QUEUE1 DONE" runs/r4/queue.log 2>/dev/null; do sleep 60; done
echo "=== queue2 start $(date +%s) ===" >> runs/r4/queue.log

echo "--- bigrid parity (pallas_big vs xla at true res)" >> runs/r4/queue.log
timeout 5400 python scripts/r4_bigrid_parity.py shape_elasto_plastic pour_soup \
  > runs/r4/bigrid_parity.jsonl 2> runs/r4/bigrid_parity.log
echo "parity rc=$?" >> runs/r4/queue.log

echo "--- bench rows: pour_soup @8, shape_elasto @16 (pallas_big)" >> runs/r4/queue.log
BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 5400 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_soup.json 2> runs/r4/bench_pour_soup.log
echo "pour_soup rc=$?" >> runs/r4/queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 5400 python scripts/bench_mpm.py \
  > runs/r4/bench_shape_elasto.json 2> runs/r4/bench_shape_elasto.log
echo "shape_elasto rc=$?" >> runs/r4/queue.log
BENCH_ENV=pour_water BENCH_NUM_ENVS=64 timeout 3600 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_water.json 2> runs/r4/bench_pour_water.log
echo "pour_water rc=$?" >> runs/r4/queue.log

echo "QUEUE2 DONE $(date +%s)" >> runs/r4/queue.log
