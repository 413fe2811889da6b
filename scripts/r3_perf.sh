#!/usr/bin/env bash
# Round-3 perf record (after r3_queue.sh): official bench rows, kernel
# traces + MXU/VPU attribution, and honest XLA-path rows for the big-grid
# envs the fused kernel doesn't cover (pour_soup 128x64x128, shape_elasto).
set -u
cd "$(dirname "$0")/.."
R=runs/r3
step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "bench rows (cloth4096, cloth1024, mpm1024)"
python bench.py > $R/bench_rows.json 2> $R/bench_rows.log
cat $R/bench_rows.json

step "kernel traces + attribution"
python scripts/trace_kernels.py --num_envs 1024 > $R/trace_attribution.jsonl \
  2> $R/trace_attribution.log
cat $R/trace_attribution.jsonl

step "XLA-path rows: big-grid envs at training batch"
for cfg in "pour_water 64" "pour_soup 8" "shape_elasto_plastic 16"; do
  set -- $cfg
  env_name=$1; nenv=$2
  echo "--- $env_name @$nenv"
  BENCH_ENV=$env_name BENCH_NUM_ENVS=$nenv BENCH_EP_LEN=3 BENCH_ITERS=2 \
    timeout 1800 python scripts/bench_mpm.py \
    >> $R/bigrid_rows.jsonl 2> $R/bigrid_${env_name}.log \
    || echo "{\"env\": \"$env_name\", \"num_envs\": $nenv, \"error\": \"failed/timeout\"}" >> $R/bigrid_rows.jsonl
  tail -1 $R/bigrid_rows.jsonl
done

step "focus-window ceiling probe: whip_rope sps vs grid-plane size"
# how much would a windowed (smaller-plane) transfer help? Pure-perf probe:
# same kernel, smaller res. (16,16,32) = 1/4 the plane FLOPs of (32,32,32).
for res in "32 32 32" "16 16 32" "16 16 16"; do
  set -- $res
  echo "--- res ($1,$2,$3)"
  BENCH_ENV=whip_rope BENCH_NUM_ENVS=256 BENCH_RES="$1,$2,$3" BENCH_ITERS=2 \
    timeout 900 python scripts/bench_mpm.py >> $R/window_probe.jsonl \
    2> /dev/null || echo "{\"res\": \"$res\", \"error\": true}" >> $R/window_probe.jsonl
  tail -1 $R/window_probe.jsonl
done

step "identify pipeline on-chip (expert gen -> PointNet++ regression -> resim)"
timeout 3600 python scripts/r3_identify.py > $R/identify.log 2>&1 \
  || echo "identify failed (see $R/identify.log)"
tail -2 $R/identify.log

echo "=== perf done ==="
