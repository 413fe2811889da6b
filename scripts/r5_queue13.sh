#!/bin/bash
# Round-5 chip queue 13: wait for the in-flight K arm, run the FIXED
# exec-timeout probes (host-readback forced), finish K refinement, then
# PPO v3, then a bench.py sanity run.
set -u
cd /root/repo
Q=runs/r5/queue13.log
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
echo "=== queue13 start $(date) ===" >> $Q
for S in 30 90 200; do
  SECS=$S timeout 1200 python scripts/r5_exec_timeout_probe.py \
    >> runs/r5/exec_timeout_probe.jsonl 2> runs/r5/exec_probe_v2_${S}.log
  echo "probe-v2 ${S}s rc=$?" >> $Q
done
if ! grep -q '"K": 40' runs/r5/b16_chain.jsonl; then
  B=16 K=40 timeout 2400 python scripts/r5_b16_chain.py \
    >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain_K40.log
  echo "K=40 rc=$?" >> $Q
fi
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope_v3 \
  PPO_MIN_STD=0.05 timeout 3600 python scripts/r4_ppo.py \
  > runs/r5/ppo_shape_rope_v3.log 2>&1
echo "ppo v3 rc=$?" >> $Q
timeout 1800 python bench.py > runs/r5/bench_final.json 2> runs/r5/bench_final.log
echo "bench rc=$?" >> $Q
echo "=== queue13 done $(date) ===" >> $Q
