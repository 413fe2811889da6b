#!/bin/bash
# Round-2 acceptance, second pass: whip_rope (train() obs-sizing fixed) and
# fold_cloth3 with the LR schedule (the fixed-LR pass diverged after it60).
export PATH=/opt/venv/bin:$PATH
cd /root/repo
mkdir -p runs/r2

echo "=== whip_rope APG (reference config: 4 envs, ep3, lr 1e-4) ==="
python -m unidom_tpu.cli train \
  --env whip_rope --ep_len 3 --num_envs 4 --lr 1e-4 \
  --max_grad_norm 0.3 --seed 0 --eval_freq 50 --num_eval_envs 4 \
  --max_it 500 --logdir runs/r2/whip_rope_4 \
  > runs/r2/whip_rope_4.log 2>&1
echo "whip_rope rc=$?"

echo "=== fold_cloth3 APG @1024 envs + lr_decay ==="
python -m unidom_tpu.cli train \
  --env fold_cloth3 --ep_len 3 --num_envs 1024 --lr 1e-4 --lr_decay \
  --max_grad_norm 0.3 --seed 0 --eval_freq 20 --num_eval_envs 20 \
  --max_it 300 --logdir runs/r2/fold_cloth3_1024_decay \
  > runs/r2/fold_cloth3_1024_decay.log 2>&1
echo "fold_cloth3 decay rc=$?"
