#!/bin/bash
# Round-4 continuation v2 (after the remat2 Mosaic lesson): waits for the
# parity3 marker, then runs the big-grid + bf16 benches and the remaining
# symmetric-parity reference seeds, then PPO with whatever time remains.
# identify is dropped this round (r3 record stands) — chip-time triage.
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "parity3 rc=" runs/r4/queue.log 2>/dev/null; do sleep 30; done
# let the wedged whip-obs recorder die before timing-sensitive stages
while ps -p 3451 > /dev/null 2>&1; do sleep 30; done
echo "=== fixqueue2 start $(date +%s) ===" >> runs/r4/queue.log

BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 3600 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_soup.json 2> runs/r4/bench_pour_soup.log
echo "pour_soup3 rc=$?" >> runs/r4/queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 3600 python scripts/bench_mpm.py \
  > runs/r4/bench_shape_elasto.json 2> runs/r4/bench_shape_elasto.log
echo "shape_elasto3 rc=$?" >> runs/r4/queue.log

BENCH_KDTYPE=bf16 BENCH_NUM_ENVS=1024 timeout 3600 python bench.py \
  > runs/r4/bench_bf16.json 2> runs/r4/bench_bf16.log
echo "bf16 bench3 rc=$?" >> runs/r4/queue.log

for seed in 1 2; do
  timeout 3900 python scripts/reference_baseline_run.py \
    --env fold_cloth3 --max_it 300 --seed $seed \
    --out runs/r4/reference_fold_cloth3_s$seed.jsonl \
    > runs/r4/reference_fold_cloth3_s$seed.log 2>&1
  echo "ref seed $seed rc=$?" >> runs/r4/queue.log
done

PPO_ITERS=150 PPO_NUM_ENVS=64 timeout 4500 python scripts/r4_ppo.py \
  > runs/r4/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> runs/r4/queue.log

echo "FIXQUEUE2 DONE $(date +%s)" >> runs/r4/queue.log
