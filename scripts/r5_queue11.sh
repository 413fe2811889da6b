#!/bin/bash
# Round-5 chip queue 11: wait for the in-flight B8K20 arm, then the level-3
# B=16 bisect (k60 / env / mini), then PPO v3.
set -u
cd /root/repo
Q=runs/r5/queue11.log
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
echo "=== queue11 start $(date) ===" >> $Q
for MODE in k60 env mini; do
  B=16 MODE=$MODE timeout 2400 python scripts/r5_b16_chain2.py \
    >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain2_${MODE}.log
  echo "mode=$MODE rc=$?" >> $Q
done
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v3 \
  PPO_MIN_STD=0.05 timeout 3600 python scripts/r4_ppo.py \
  > runs/r5/ppo_shape_rope_v3.log 2>&1
echo "ppo v3 rc=$?" >> $Q
echo "=== queue11 done $(date) ===" >> $Q
