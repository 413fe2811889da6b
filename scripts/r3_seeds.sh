#!/usr/bin/env bash
# fold_cloth3 @4 seed sweep: the single-seed head-to-head left ours at
# chamfer 0.0335 vs the reference-code run's 0.0132 on the same chip —
# while fold_cloth1 went the other way (0.0179 ours vs 0.0192 reference).
# BPTT at 4 envs is high-variance; measure it.
set -u
cd "$(dirname "$0")/.."
R=runs/r3
for seed in 1 2 3; do
  echo "=== seed $seed ==="
  python -m unidom_tpu.algorithms.apg --env fold_cloth3 --ep_len 3 --num_envs 4 \
    --lr 1e-4 --max_grad_norm 0.3 --seed $seed --eval_freq 20 --max_it 600 \
    --num_eval_envs 4 --logdir $R/fold_cloth3_4_s$seed > $R/fold_cloth3_4_s$seed.log 2>&1
  grep test_reward $R/fold_cloth3_4_s$seed.log | tail -1
done
echo "=== seeds done ==="
