#!/bin/bash
# Round-2 acceptance convergence runs (BASELINE.md required configs).
# Sequential on the one real TPU chip; metrics land in runs/r2/*/metrics.jsonl.
export PATH=/opt/venv/bin:$PATH
cd /root/repo
mkdir -p runs/r2

echo "=== fold_cloth3 APG @1024 envs (reference README config, batched) ==="
python -m unidom_tpu.cli train \
  --env fold_cloth3 --ep_len 3 --num_envs 1024 --lr 1e-4 \
  --max_grad_norm 0.3 --seed 0 --eval_freq 20 --num_eval_envs 20 \
  --max_it 300 --logdir runs/r2/fold_cloth3_1024 \
  > runs/r2/fold_cloth3_1024.log 2>&1
echo "fold_cloth3 rc=$?"

echo "=== whip_rope APG (reference exact config, trimmed max_it) ==="
python -m unidom_tpu.cli train \
  --env whip_rope --ep_len 3 --num_envs 4 --lr 1e-4 \
  --max_grad_norm 0.3 --seed 0 --eval_freq 100 --num_eval_envs 4 \
  --max_it 1000 --logdir runs/r2/whip_rope_4 \
  > runs/r2/whip_rope_4.log 2>&1
echo "whip_rope rc=$?"
