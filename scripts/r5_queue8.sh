#!/bin/bash
# Round-5 chip queue 8 (waits for queue 7): B=16 chain-length bisect.
set -u
cd /root/repo
Q=runs/r5/queue8.log
while ! grep -q "queue7 done" runs/r5/queue7.log 2>/dev/null; do sleep 60; done
echo "=== queue8 start $(date) ===" >> $Q
for K in 2 5 10 20; do
  B=16 K=$K timeout 3600 python scripts/r5_b16_chain.py \
    >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain_K${K}.log
  echo "K=$K rc=$?" >> $Q
done
# boundary refinement at B: does B=8 handle K=20?
B=8 K=20 timeout 3600 python scripts/r5_b16_chain.py \
  >> runs/r5/b16_chain.jsonl 2> runs/r5/b16_chain_B8K20.log
echo "B8 K=20 rc=$?" >> $Q
echo "=== queue8 done $(date) ===" >> $Q
