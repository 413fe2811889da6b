#!/bin/bash
# Round-5 chip queue 6 (waits for queue 5): PPO with a stronger entropy
# floor (the 0.0/0.1 hinge slowed but did not stop the collapse:
# entropy reached -27 while eval recovered to 4.24 - runs/r5/ppo_shape_rope).
set -u
cd /root/repo
Q=runs/r5/queue6.log
while ! grep -q "queue5 done" runs/r5/queue5.log 2>/dev/null; do sleep 120; done
echo "=== queue6 start $(date) ===" >> $Q
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v2 \
  PPO_ENT_FLOOR=2.0 PPO_ENT_COST=1.0 \
  timeout 5400 python scripts/r4_ppo.py > runs/r5/ppo_shape_rope_v2.log 2>&1
echo "ppo v2 rc=$?" >> $Q
echo "=== queue6 done $(date) ===" >> $Q
