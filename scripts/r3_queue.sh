#!/usr/bin/env bash
# Round-3 TPU acceptance queue (runs after scripts/r3_sweep.sh; keeps the
# single chip busy through the BASELINE required configs + reference-code
# comparison runs).
set -u
cd "$(dirname "$0")/.."
R=runs/r3

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# 1. ours: fold_cloth3 at the REFERENCE config (4 envs) — the cost-parity
#    comparison run (reference README.md:21 config, 1000 iters)
step "ours fold_cloth3 @4"
python -m unidom_tpu.algorithms.apg --env fold_cloth3 --ep_len 3 --num_envs 4 \
  --lr 1e-4 --max_grad_norm 0.3 --seed 0 --eval_freq 20 --max_it 1000 \
  --num_eval_envs 4 --logdir $R/fold_cloth3_4 > $R/fold_cloth3_4.log 2>&1
grep "test_reward" $R/fold_cloth3_4.log | tail -2

# 2. reference code (shimmed): fold_cloth3 @4 — the baseline curve
step "reference fold_cloth3 @4"
python scripts/reference_baseline_run.py --env fold_cloth3 --num_envs 4 \
  --max_it 1000 --eval_freq 20 --out $R/reference_fold_cloth3.jsonl \
  > $R/reference_fold_cloth3.log 2>&1
tail -2 $R/reference_fold_cloth3.jsonl 2>/dev/null

# 3. ours: whip_rope reference config (README.md:27: 2000 iters)
step "ours whip_rope @4"
python -m unidom_tpu.algorithms.apg --env whip_rope --ep_len 3 --num_envs 4 \
  --lr 1e-4 --max_grad_norm 0.3 --seed 0 --eval_freq 100 --max_it 2000 \
  --num_eval_envs 4 --logdir $R/whip_rope_4 > $R/whip_rope_4.log 2>&1
grep "test_reward" $R/whip_rope_4.log | tail -2

# 4. reference code (shimmed): whip_rope @4
step "reference whip_rope @4"
python scripts/reference_baseline_run.py --env whip_rope --num_envs 4 \
  --max_it 2000 --eval_freq 100 --out $R/reference_whip_rope.jsonl \
  > $R/reference_whip_rope.log 2>&1
tail -2 $R/reference_whip_rope.jsonl 2>/dev/null

# 5. ours: fold_cloth1 (train_no_para.sh config)
step "ours fold_cloth1 @4"
python -m unidom_tpu.algorithms.apg --env fold_cloth1 --ep_len 3 --num_envs 4 \
  --lr 1e-4 --max_grad_norm 0.3 --seed 0 --eval_freq 100 --max_it 2000 \
  --num_eval_envs 4 --logdir $R/fold_cloth1_4 > $R/fold_cloth1_4.log 2>&1
grep "test_reward" $R/fold_cloth1_4.log | tail -2

# 6. reference code (shimmed): fold_cloth1 @4 (finishing what the slow CPU
#    run started)
step "reference fold_cloth1 @4"
python scripts/reference_baseline_run.py --env fold_cloth1 --num_envs 4 \
  --max_it 2000 --eval_freq 100 --out $R/reference_fold_cloth1_tpu.jsonl \
  > $R/reference_fold_cloth1_tpu.log 2>&1
tail -2 $R/reference_fold_cloth1_tpu.jsonl 2>/dev/null

# 6b. the official fold_cloth3 @1024 record run: lr 3e-5 (sweep winner —
#     reaches eval 2.87 vs 1.24 untrained before the saturation attractor;
#     best-checkpoint + deterministic eval + GIFs)
step "ours fold_cloth3 @1024 record (lr 3e-5)"
python -m unidom_tpu.algorithms.apg --env fold_cloth3 --ep_len 3 --num_envs 1024 \
  --lr 3e-5 --max_grad_norm 0.3 --seed 0 --eval_freq 10 --max_it 300 \
  --save_gif --logdir $R/fold_cloth3_1024_record > $R/fold_cloth3_1024_record.log 2>&1
grep "test_reward" $R/fold_cloth3_1024_record.log | tail -3

# 7. fold_cloth1_para with the reference stiffness ranges (train_para.sh)
step "fold_cloth1_para"
python -m unidom_tpu.algorithms.apg_para --env fold_cloth1_para --ep_len 3 \
  --num_envs 4 --lr 1e-4 --max_grad_norm 0.3 --seed 0 --eval_freq 100 \
  --max_it 2000 --train_min_stiff 1000 --train_max_stiff 1600 \
  --eval_min_stiff 10 --eval_max_stiff 1800 \
  --logdir $R/fold_cloth1_para > $R/fold_cloth1_para.log 2>&1
grep "sweep mean" $R/fold_cloth1_para.log | tail -2

# 8. unconditioned comparator (apg_no_para): same stiffness randomization,
#    policy does NOT observe stiffness — the GenORM claim is the conditioned
#    policy beating this outside the training range
step "fold_cloth1 no_para comparator"
python -m unidom_tpu.algorithms.apg_para --env fold_cloth1 --ep_len 3 \
  --num_envs 4 --lr 1e-4 --max_grad_norm 0.3 --seed 0 --eval_freq 100 \
  --max_it 2000 --train_min_stiff 1000 --train_max_stiff 1600 \
  --eval_min_stiff 10 --eval_max_stiff 1800 \
  --logdir $R/fold_cloth1_no_para > $R/fold_cloth1_no_para.log 2>&1
grep "sweep mean" $R/fold_cloth1_no_para.log | tail -2

echo "=== queue done ==="
