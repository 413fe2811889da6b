#!/bin/bash
# Round-5 chip queue 2: bf16 big-kernel rows, B=16 fault check, on-chip
# parity (TPU phase), whip_rope trace.
cd /root/repo
Q=runs/r5/queue2.log
echo "=== start $(date) ===" >> $Q

echo "--- shape_elasto bf16 @4" >> $Q
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=4 BENCH_KERNEL_DTYPE=bf16 \
  timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_shape_elasto_bf16.json 2> runs/r5/bench_shape_elasto_bf16.log
echo "shape_elasto bf16 rc=$?" >> $Q

echo "--- pour_soup bf16 @8" >> $Q
BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 BENCH_KERNEL_DTYPE=bf16 \
  timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_pour_soup_bf16.json 2> runs/r5/bench_pour_soup_bf16.log
echo "pour_soup bf16 rc=$?" >> $Q

echo "--- shape_elasto @16 fault check (f32)" >> $Q
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=16 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_shape_elasto_b16.json 2> runs/r5/bench_shape_elasto_b16.log
echo "shape_elasto b16 rc=$?" >> $Q

echo "--- on-chip parity TPU phase" >> $Q
PHASE=tpu PARITY_ENV=pour_soup timeout 3600 python scripts/r5_onchip_parity.py \
  >> runs/r5/onchip_parity_tpu.log 2>&1
echo "parity pour_soup tpu rc=$?" >> $Q
PHASE=tpu PARITY_ENV=shape_elasto_plastic timeout 3600 python scripts/r5_onchip_parity.py \
  >> runs/r5/onchip_parity_tpu.log 2>&1
echo "parity shape_elasto tpu rc=$?" >> $Q

echo "--- whip_rope trace @1024" >> $Q
timeout 3600 python scripts/trace_kernels.py --configs mpm --num_envs 1024 \
  --trace_dir runs/r5/traces > runs/r5/trace_whip.json 2> runs/r5/trace_whip.log
echo "whip trace rc=$?" >> $Q
echo "=== done $(date) ===" >> $Q
