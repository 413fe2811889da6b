#!/bin/bash
# Final whip-obs recording attempt. The reference reset is bimodal: ~2 min
# when it works (runs/r3/reference_whip_rope_retry.log — full 300-it run in
# 12.5 min), unbounded host-RAM blowup otherwise (5 recorded wedges across
# r3+r4). One more bounded roll, overlapping PPO (reward-metric, not
# walltime), then the CPU golden test if it recorded.
set -u
cd /root/repo
while ! grep -q "shape_elasto4 rc=" runs/r4/queue.log 2>/dev/null; do sleep 30; done
echo "=== whip retry2 start $(date +%s) ===" >> runs/r4/queue.log

RECORD_ON_TPU=1 timeout 900 python scripts/record_whip_rope_obs.py \
  > runs/r4/record_whip_obs3.log 2>&1
echo "record3 rc=$?" >> runs/r4/queue.log

if [ -f tests/fixtures/whip_rope_ref_obs.npz ]; then
  JAX_PLATFORMS=cpu timeout 1800 python -m pytest \
    tests/test_golden.py::test_whip_rope_obs_contract_vs_reference -x -q \
    > runs/r4/whip_obs_golden.log 2>&1
  echo "golden rc=$?" >> runs/r4/queue.log
fi
echo "WHIP RETRY2 DONE $(date +%s)" >> runs/r4/queue.log
