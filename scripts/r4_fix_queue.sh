#!/bin/bash
# Round-4 continuation queue: reruns the big-grid records with the fixed
# kernels (bwd remat + fori-loop slabs + macro-call remat gate), the bf16
# MPM bench (cloth stays f32 — probe rejected), then the reference-shim
# fold_cloth3 seeds for the symmetric-parity record (2 more seeds; with
# r3's seed 0 that makes median-of-3 vs our median-of-4), then shortened
# identify + PPO with whatever chip time remains.
set -u
cd /root/repo
mkdir -p runs/r4
echo "=== fixqueue start $(date +%s) ===" >> runs/r4/queue.log

timeout 4500 python scripts/r4_bigrid_parity.py shape_elasto_plastic pour_soup \
  > runs/r4/bigrid_parity2.jsonl 2> runs/r4/bigrid_parity2.log
echo "parity2 rc=$?" >> runs/r4/queue.log

# the wedged whip-obs recorder (host-bound trace) may still be alive; let
# it finish/timeout before the timing-sensitive bench stages
while ps -p 3451 > /dev/null 2>&1; do sleep 30; done

BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 4500 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_soup.json 2> runs/r4/bench_pour_soup.log
echo "pour_soup2 rc=$?" >> runs/r4/queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 4500 python scripts/bench_mpm.py \
  > runs/r4/bench_shape_elasto.json 2> runs/r4/bench_shape_elasto.log
echo "shape_elasto2 rc=$?" >> runs/r4/queue.log

BENCH_KDTYPE=bf16 BENCH_NUM_ENVS=1024 timeout 3600 python bench.py \
  > runs/r4/bench_bf16.json 2> runs/r4/bench_bf16.log
echo "bf16 bench2 rc=$?" >> runs/r4/queue.log

for seed in 1 2; do
  timeout 4200 python scripts/reference_baseline_run.py \
    --env fold_cloth3 --max_it 300 --seed $seed \
    --out runs/r4/reference_fold_cloth3_s$seed.jsonl \
    > runs/r4/reference_fold_cloth3_s$seed.log 2>&1
  echo "ref seed $seed rc=$?" >> runs/r4/queue.log
done

PPO_ITERS=150 PPO_NUM_ENVS=64 timeout 5400 python scripts/r4_ppo.py \
  > runs/r4/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> runs/r4/queue.log

timeout 5400 python scripts/r4_identify.py > runs/r4/identify.log 2>&1
echo "identify rc=$?" >> runs/r4/queue.log

echo "FIXQUEUE DONE $(date +%s)" >> runs/r4/queue.log
