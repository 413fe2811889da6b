#!/bin/bash
# --lr_decay validation (VERDICT weak #5): fold_cloth1 @64 envs, the config
# whose fixed-LR run collapsed after it200 (docs/BENCHMARKS.md). Waits for the
# acceptance runs to release the chip, then trains with the cosine schedule.
export PATH=/opt/venv/bin:$PATH
cd /root/repo
# $1 = PID of the acceptance-run script to wait for (optional)
if [ -n "$1" ]; then while kill -0 "$1" 2>/dev/null; do sleep 20; done; fi
mkdir -p runs/r2
python -m unidom_tpu.cli train \
  --env fold_cloth1 --ep_len 3 --num_envs 64 --lr 3e-4 --lr_decay \
  --max_grad_norm 0.3 --seed 0 --eval_freq 20 --num_eval_envs 20 \
  --max_it 800 --logdir runs/r2/fold_cloth1_lrdecay \
  > runs/r2/fold_cloth1_lrdecay.log 2>&1
echo "lr_decay rc=$?"
