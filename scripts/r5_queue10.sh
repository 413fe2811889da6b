#!/bin/bash
# Round-5 chip queue 10 (this session): run the stranded queue8+queue9 work
# directly — B=16 chain-length bisect, then PPO v3 with the min_std floor.
set -u
cd /root/repo
Q=runs/r5/queue10.log
echo "=== queue10 start $(date) ===" >> $Q
for K in 2 5 10 20; do
  B=16 K=$K timeout 1800 python scripts/r5_b16_chain.py \
    >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain_K${K}.log
  echo "K=$K rc=$?" >> $Q
done
B=8 K=20 timeout 1800 python scripts/r5_b16_chain.py \
  >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain_B8K20.log
echo "B8 K=20 rc=$?" >> $Q
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v3 \
  PPO_MIN_STD=0.05 timeout 3600 python scripts/r4_ppo.py \
  > runs/r5/ppo_shape_rope_v3.log 2>&1
echo "ppo v3 rc=$?" >> $Q
echo "=== queue10 done $(date) ===" >> $Q
