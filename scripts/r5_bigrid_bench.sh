#!/bin/bash
# Round-5 item 1: on-chip bench of the reworked (stacked+y-windowed) big
# kernel. Bars: pour_soup >= 4 sps @8, shape_elasto >= 2 sps @4.
cd /root/repo
mkdir -p runs/r5
echo "=== pour_soup @8 $(date) ===" >> runs/r5/bigrid_queue.log
BENCH_ENV=pour_soup BENCH_NUM_ENVS=8 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_pour_soup.json 2> runs/r5/bench_pour_soup.log
echo "pour_soup rc=$?" >> runs/r5/bigrid_queue.log
echo "=== shape_elasto @4 $(date) ===" >> runs/r5/bigrid_queue.log
BENCH_ENV=shape_elasto_plastic BENCH_NUM_ENVS=4 timeout 5400 python scripts/bench_mpm.py \
  > runs/r5/bench_shape_elasto.json 2> runs/r5/bench_shape_elasto.log
echo "shape_elasto rc=$?" >> runs/r5/bigrid_queue.log
cat runs/r5/bench_pour_soup.json runs/r5/bench_shape_elasto.json
