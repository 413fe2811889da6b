#!/bin/bash
# Round-4 TPU queue #7 (waits for queue #6): fresh fold_cloth3 4-env seed
# sweep at 2000 iterations for the symmetric parity record — the r3 sweep
# stopped at 600-1000 its (<=270 s/seed); 2000 its is ~550 s/seed, still
# ~3x less walltime than the reference shim's 1800 s/seed. All 4 seeds
# reported (median + best, no selection).
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "QUEUE6 DONE" runs/r4/queue.log 2>/dev/null; do sleep 60; done
echo "=== queue7 start $(date +%s) ===" >> runs/r4/queue.log

for seed in 0 1 2 3; do
  timeout 2400 python -m unidom_tpu.algorithms.apg --env fold_cloth3 \
    --ep_len 3 --num_envs 4 --lr 1e-4 --max_grad_norm 0.3 --seed $seed \
    --eval_freq 20 --max_it 2000 --num_eval_envs 4 \
    --logdir runs/r4/fold_cloth3_s$seed \
    > runs/r4/fold_cloth3_s$seed.log 2>&1
  echo "ours seed $seed rc=$?" >> runs/r4/queue.log
  timeout 900 python scripts/eval_chamfer.py --env fold_cloth3 \
    --ckpt runs/r4/fold_cloth3_s$seed/apg_fold_cloth3_best.pkl \
    --num_envs 4 --seed $seed \
    >> runs/r4/ours_fold_cloth3_seed_costs_r4.jsonl 2>/dev/null
  echo "eval seed $seed rc=$?" >> runs/r4/queue.log
done

echo "QUEUE7 DONE $(date +%s)" >> runs/r4/queue.log
