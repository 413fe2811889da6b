#!/bin/bash
# Round-4 continuation v3: after the in-flight reference seed 2 exits,
# rerun the big-grid benches with the PC=64 + flat-remat fixes, then a
# short PPO record with the remaining chip time.
set -u
cd /root/repo
while ps -p 9306 > /dev/null 2>&1; do sleep 30; done
echo "=== fixqueue3 start $(date +%s) ===" >> runs/r4/queue.log

# MPM bf16 probe row (BENCH_NUM_ENVS forces cloth-only rows, so the
# earlier bf16 run never measured the MPM row — use BENCH_ROWS)
BENCH_KDTYPE=bf16 BENCH_ROWS=mpm1024 timeout 2700 python bench.py \
  > runs/r4/bench_bf16_mpm.json 2> runs/r4/bench_bf16_mpm.log
echo "bf16 mpm rc=$?" >> runs/r4/queue.log

BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 2700 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_soup.json 2> runs/r4/bench_pour_soup.log
echo "pour_soup4 rc=$?" >> runs/r4/queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 2700 python scripts/bench_mpm.py \
  > runs/r4/bench_shape_elasto.json 2> runs/r4/bench_shape_elasto.log
echo "shape_elasto4 rc=$?" >> runs/r4/queue.log

PPO_ITERS=100 PPO_NUM_ENVS=64 timeout 3600 python scripts/r4_ppo.py \
  > runs/r4/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> runs/r4/queue.log

echo "FIXQUEUE3 DONE $(date +%s)" >> runs/r4/queue.log
