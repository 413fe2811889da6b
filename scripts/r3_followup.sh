#!/usr/bin/env bash
# Post-queue follow-ups: reruns that needed fixes discovered mid-queue.
set -u
cd "$(dirname "$0")/.."
R=runs/r3
step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# reference fold_cloth3 @4 — first attempt OOM'd at mem_saving_level=0
# (50 GB residuals); rerun at the reference's own level 2 after the
# float-stiffness fix (see scripts/reference_baseline_run.py)
step "reference fold_cloth3 @4 (retry, mem level 2)"
python scripts/reference_baseline_run.py --env fold_cloth3 --num_envs 4 \
  --max_it 1000 --eval_freq 20 --out $R/reference_fold_cloth3.jsonl \
  > $R/reference_fold_cloth3_retry.log 2>&1
tail -2 $R/reference_fold_cloth3.jsonl

echo "=== followup done ==="
