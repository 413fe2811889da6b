#!/bin/bash
# Round-5 chip queue 7 (waits for queue 5): shape_elasto B=16 full-training
# bench on the manual remat (the single-step bisect passed all arms), then
# the stronger-floor PPO re-run.
set -u
cd /root/repo
Q=runs/r5/queue7.log
while ! grep -q "queue5 done" runs/r5/queue5.log 2>/dev/null; do sleep 60; done
echo "=== queue7 start $(date) ===" >> $Q
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_shape_elasto_b16_v2.json 2> runs/r5/bench_shape_elasto_b16_v2.log
echo "se b16 v2 rc=$?" >> $Q
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v2 \
  PPO_ENT_FLOOR=2.0 PPO_ENT_COST=1.0 \
  timeout 5400 python scripts/r4_ppo.py > runs/r5/ppo_shape_rope_v2.log 2>&1
echo "ppo v2 rc=$?" >> $Q
echo "=== queue7 done $(date) ===" >> $Q
