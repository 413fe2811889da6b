#!/bin/bash
# Round-5 chip queue 12: wait for the in-flight `mini` bisect arm, run the
# axon execution-timeout probes (30 s control, then 120/180 s), K-boundary
# refinement arms, then PPO v3.
set -u
cd /root/repo
Q=runs/r5/queue12.log
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
echo "=== queue12 start $(date) ===" >> $Q
for S in 30 120 240; do
  SECS=$S timeout 1200 python scripts/r5_exec_timeout_probe.py \
    >> runs/r5/exec_timeout_probe.jsonl 2> runs/r5/exec_probe_${S}.log
  echo "probe ${S}s rc=$?" >> $Q
done
# K boundary refinement on the plain chain (discriminates time vs K)
for K in 30 40; do
  B=16 K=$K timeout 2400 python scripts/r5_b16_chain.py \
    >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain_K${K}.log
  echo "K=$K rc=$?" >> $Q
done
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v3 \
  PPO_MIN_STD=0.05 timeout 3600 python scripts/r4_ppo.py \
  > runs/r5/ppo_shape_rope_v3.log 2>&1
echo "ppo v3 rc=$?" >> $Q
echo "=== queue12 done $(date) ===" >> $Q
