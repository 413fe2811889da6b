#!/bin/bash
# Round-4 master queue v3: regenerates ALL the round-4 TPU records that the
# container restart wiped before they could be committed (runs/r4 had only
# the ours_fold_cloth3_seed_costs.jsonl artifact left). Serialized — one
# TPU process at a time. Every stage is timeout-bounded and the queue
# continues past failures; rc codes land in runs/r4/queue.log.
set -u
cd /root/repo
mkdir -p runs/r4
echo "=== master3 start $(date +%s) ===" >> runs/r4/queue.log

# 1. Big-grid kernel true-res parity (verdict items 1+2) — the headline.
timeout 4500 python scripts/r4_bigrid_parity.py shape_elasto_plastic pour_soup \
  > runs/r4/bigrid_parity.jsonl 2> runs/r4/bigrid_parity.log
echo "parity rc=$?" >> runs/r4/queue.log

# 2. Big-grid + pour_water bench rows (items 1/2 "done =" numbers).
BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 4500 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_soup.json 2> runs/r4/bench_pour_soup.log
echo "pour_soup rc=$?" >> runs/r4/queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 4500 python scripts/bench_mpm.py \
  > runs/r4/bench_shape_elasto.json 2> runs/r4/bench_shape_elasto.log
echo "shape_elasto rc=$?" >> runs/r4/queue.log
BENCH_ENV=pour_water BENCH_NUM_ENVS=64 timeout 3600 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_water.json 2> runs/r4/bench_pour_water.log
echo "pour_water rc=$?" >> runs/r4/queue.log

# 3. Headline bench f32 + bf16 probe (items 4/10 throughput evidence).
timeout 3600 python bench.py > runs/r4/bench_check.json 2> runs/r4/bench_check.log
echo "bench rc=$?" >> runs/r4/queue.log
BENCH_KDTYPE=bf16 BENCH_NUM_ENVS=1024 timeout 3600 python bench.py \
  > runs/r4/bench_bf16.json 2> runs/r4/bench_bf16.log
echo "bf16 bench rc=$?" >> runs/r4/queue.log

# 4. whip_rope obs fixture on the TPU + golden test (item 6).
RECORD_ON_TPU=1 timeout 3600 python scripts/record_whip_rope_obs.py \
  > runs/r4/record_whip_obs.log 2>&1
echo "record rc=$?" >> runs/r4/queue.log
timeout 1800 python -m pytest tests/test_golden.py::test_whip_rope_obs_contract_vs_reference -x -q \
  > runs/r4/whip_obs_golden.log 2>&1
echo "golden rc=$?" >> runs/r4/queue.log

# 5. Reference shim fold_cloth3 seeds 1-3 (item 3 symmetric parity; seed 0
#    is runs/r3/reference_fold_cloth3.jsonl).
for seed in 1 2 3; do
  timeout 4500 python scripts/reference_baseline_run.py \
    --env fold_cloth3 --max_it 300 --seed $seed \
    --out runs/r4/reference_fold_cloth3_s$seed.jsonl \
    > runs/r4/reference_fold_cloth3_s$seed.log 2>&1
  echo "ref seed $seed rc=$?" >> runs/r4/queue.log
done

# 6. Identification tightening (item 8).
timeout 7200 python scripts/r4_identify.py > runs/r4/identify.log 2>&1
echo "identify rc=$?" >> runs/r4/queue.log

# 7. PPO training record (item 7).
PPO_ITERS=300 PPO_NUM_ENVS=64 timeout 9000 python scripts/r4_ppo.py \
  > runs/r4/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> runs/r4/queue.log

echo "MASTER3 DONE $(date +%s)" >> runs/r4/queue.log
