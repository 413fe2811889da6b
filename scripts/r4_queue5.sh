#!/bin/bash
# Round-4 TPU queue #5 (waits for queue #4): reference whip_rope obs
# recording on the TPU (verdict item 6 — the XLA-CPU compile of the
# reference engine is pathological), then the whip_rope golden test.
set -u
cd /root/repo
mkdir -p runs/r4
while ! grep -q "QUEUE4 DONE" runs/r4/queue.log 2>/dev/null; do sleep 60; done
echo "=== queue5 start $(date +%s) ===" >> runs/r4/queue.log

RECORD_ON_TPU=1 timeout 3600 python scripts/record_whip_rope_obs.py \
  > runs/r4/record_whip_obs.log 2>&1
echo "record rc=$?" >> runs/r4/queue.log

timeout 1800 python -m pytest tests/test_golden.py::test_whip_rope_obs_contract_vs_reference -x -q \
  > runs/r4/whip_obs_golden.log 2>&1
echo "golden rc=$?" >> runs/r4/queue.log

echo "QUEUE5 DONE $(date +%s)" >> runs/r4/queue.log
