#!/bin/bash
# Round-4 master queue v2: waits for the in-flight whip_rope obs recording
# (launched by master v1, PID-watched) to finish, then runs the 8-aligned
# big-kernel validation FIRST, then the remaining round-4 records.
set -u
cd /root/repo
while ps -p 25611 > /dev/null 2>&1; do sleep 30; done
echo "=== master2 start $(date +%s) ===" >> runs/r4/queue.log

timeout 1800 python -m pytest tests/test_golden.py::test_whip_rope_obs_contract_vs_reference -x -q \
  > runs/r4/whip_obs_golden.log 2>&1
echo "golden rc=$?" >> runs/r4/queue.log

timeout 5400 python scripts/r4_bigrid_parity.py shape_elasto_plastic pour_soup \
  > runs/r4/bigrid_parity.jsonl 2> runs/r4/bigrid_parity.log
echo "parity3 rc=$?" >> runs/r4/queue.log
BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 5400 python scripts/bench_mpm.py \
  > runs/r4/bench_pour_soup.json 2> runs/r4/bench_pour_soup.log
echo "pour_soup rc=$?" >> runs/r4/queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 5400 python scripts/bench_mpm.py \
  > runs/r4/bench_shape_elasto.json 2> runs/r4/bench_shape_elasto.log
echo "shape_elasto rc=$?" >> runs/r4/queue.log

timeout 7200 python scripts/r4_identify.py > runs/r4/identify.log 2>&1
echo "identify rc=$?" >> runs/r4/queue.log

PPO_ITERS=300 PPO_NUM_ENVS=64 timeout 10800 python scripts/r4_ppo.py \
  > runs/r4/ppo_shape_rope.log 2>&1
echo "ppo rc=$?" >> runs/r4/queue.log

timeout 3600 python bench.py > runs/r4/bench_check.json 2> runs/r4/bench_check.log
echo "bench rc=$?" >> runs/r4/queue.log
BENCH_KDTYPE=bf16 BENCH_NUM_ENVS=1024 timeout 5400 python bench.py \
  > runs/r4/bench_bf16.json 2> runs/r4/bench_bf16.log
echo "bf16 bench rc=$?" >> runs/r4/queue.log

rm -f runs/r4/reference_fold_cloth3_s2.jsonl
timeout 3600 python scripts/reference_baseline_run.py \
  --env fold_cloth3 --max_it 300 --seed 2 \
  --out runs/r4/reference_fold_cloth3_s2.jsonl \
  > runs/r4/reference_fold_cloth3_s2_retry.log 2>&1
echo "seed2 retry rc=$?" >> runs/r4/queue.log

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

echo "MASTER2 DONE $(date +%s)" >> runs/r4/queue.log
