#!/bin/bash
# Round-5 chip queue 3 (waits for queue 2): big-grid re-bench after the
# aligned-ywindow + CKPT_K=1 changes, fold_cloth3 symmetric-median arms,
# PPO entropy-floor re-run, identify run.
set -u
cd /root/repo
Q=runs/r5/queue3.log
while ! grep -q "=== done" runs/r5/queue2.log 2>/dev/null; do sleep 60; done
echo "=== queue3 start $(date) ===" >> $Q

echo "--- shape_elasto @4 re-bench (ywin + CKPT1)" >> $Q
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=4 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_shape_elasto_v2.json 2> runs/r5/bench_shape_elasto_v2.log
echo "se v2 rc=$?" >> $Q
echo "--- pour_soup @8 re-bench (CKPT1)" >> $Q
BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_pour_soup_v2.json 2> runs/r5/bench_pour_soup_v2.log
echo "ps v2 rc=$?" >> $Q

echo "--- reference fold_cloth3 seed 3" >> $Q
timeout 4000 python scripts/reference_baseline_run.py --env fold_cloth3 \
  --num_envs 4 --ep_len 3 --lr 1e-4 --max_grad_norm 0.3 --max_it 300 \
  --eval_freq 20 --seed 3 --out runs/r5/reference_fold_cloth3_s3.jsonl \
  > runs/r5/reference_fold_cloth3_s3.log 2>&1
echo "ref s3 rc=$?" >> $Q

for pen in 0.0 0.001; do
  tag=$([ "$pen" = "0.0" ] && echo off || echo on)
  for seed in 0 1 2 3; do
    d=runs/r5/fold_cloth3_s${seed}_pen${tag}
    timeout 2400 python -m unidom_tpu.algorithms.apg --env fold_cloth3 \
      --ep_len 3 --num_envs 4 --lr 1e-4 --max_grad_norm 0.3 --seed $seed \
      --eval_freq 20 --max_it 2000 --num_eval_envs 4 \
      --pre_squash_penalty $pen --logdir $d > $d.log 2>&1
    echo "ours s$seed pen=$tag rc=$?" >> $Q
    timeout 900 python scripts/eval_chamfer.py --env fold_cloth3 \
      --ckpt $d/apg_fold_cloth3_best.pkl --num_envs 4 --seed $seed \
      >> runs/r5/ours_fold_cloth3_costs_pen${tag}.jsonl 2>/dev/null
    echo "eval s$seed pen=$tag rc=$?" >> $Q
  done
done

echo "--- PPO shape_rope with entropy floor" >> $Q
PPO_ITERS=60 PPO_NUM_ENVS=64 PPO_OUT=runs/r5/ppo_shape_rope \
  timeout 7200 python scripts/r4_ppo.py > runs/r5/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> $Q

echo "--- identify (r4_identify: 240 experts, SA-MSG, held-out)" >> $Q
timeout 14400 python scripts/r4_identify.py > runs/r5/identify.log 2>&1
echo "identify rc=$?" >> $Q
echo "=== queue3 done $(date) ===" >> $Q
