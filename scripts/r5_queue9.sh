#!/bin/bash
# Round-5 chip queue 9 (waits for queue 8): PPO v3 with the structural
# min_std floor.
set -u
cd /root/repo
Q=runs/r5/queue9.log
while ! grep -q "queue8 done" runs/r5/queue8.log 2>/dev/null; do sleep 60; done
echo "=== queue9 start $(date) ===" >> $Q
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v3 \
  PPO_MIN_STD=0.05 timeout 5400 python scripts/r4_ppo.py \
  > runs/r5/ppo_shape_rope_v3.log 2>&1
echo "ppo v3 rc=$?" >> $Q
echo "=== queue9 done $(date) ===" >> $Q
