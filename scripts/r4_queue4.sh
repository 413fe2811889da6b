#!/bin/bash
# Round-4 TPU queue #4 (waits for queue #3): bf16 kernel-dtype probes
# (verdict items 4 and 10) — same bench harness, kernel_dtype=bf16.
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "QUEUE3 DONE" runs/r4/queue.log 2>/dev/null; do sleep 60; done
echo "=== queue4 start $(date +%s) ===" >> runs/r4/queue.log

BENCH_KDTYPE=bf16 BENCH_NUM_ENVS=1024 timeout 5400 python bench.py \
  > runs/r4/bench_bf16.json 2> runs/r4/bench_bf16.log
echo "bf16 bench rc=$?" >> runs/r4/queue.log

echo "QUEUE4 DONE $(date +%s)" >> runs/r4/queue.log
