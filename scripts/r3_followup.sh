#!/usr/bin/env bash
# Post-queue follow-ups: reruns that needed fixes discovered mid-queue.
set -u
cd "$(dirname "$0")/.."
R=runs/r3
step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# reference fold_cloth3 @4 — first attempt OOM'd at mem_saving_level=0
# (50 GB residuals); rerun at the reference's own level 2 after the
# float-stiffness fix (see scripts/reference_baseline_run.py). ~6 s/iter
# on this chip -> 300 iters (fold_cloth1 converged by 200).
step "reference fold_cloth3 @4 (retry, mem level 2)"
timeout 7200 python scripts/reference_baseline_run.py --env fold_cloth3 \
  --num_envs 4 --max_it 300 --eval_freq 20 \
  --out $R/reference_fold_cloth3.jsonl \
  > $R/reference_fold_cloth3_retry.log 2>&1
tail -2 $R/reference_fold_cloth3.jsonl

# reference whip_rope @4 — first attempt hung in the stubbed render-mesh
# path; rerun after the shim fixes (no-op mesh, float primitive leaves,
# float0-safe tree ops)
step "reference whip_rope @4 (retry)"
timeout 7200 python scripts/reference_baseline_run.py --env whip_rope \
  --num_envs 4 --max_it 300 --eval_freq 20 \
  --out $R/reference_whip_rope.jsonl \
  > $R/reference_whip_rope_retry.log 2>&1
tail -2 $R/reference_whip_rope.jsonl

# unconditioned comparator (skipped by the buffered queue script): same
# stiffness randomization, policy blind to stiffness
step "fold_cloth1 no_para comparator"
python -m unidom_tpu.algorithms.apg_para --env fold_cloth1 --ep_len 3 \
  --num_envs 4 --lr 1e-4 --max_grad_norm 0.3 --seed 0 --eval_freq 100 \
  --max_it 2000 --train_min_stiff 1000 --train_max_stiff 1600 \
  --eval_min_stiff 10 --eval_max_stiff 1800 \
  --logdir $R/fold_cloth1_no_para > $R/fold_cloth1_no_para.log 2>&1
grep "sweep mean" $R/fold_cloth1_no_para.log | tail -2

echo "=== followup done ==="
