#!/bin/bash
# Round-5 verdict item 8: retry the whip_rope obs fixture recording until it
# lands. The reference engine's reset wedges host-side nondeterministically
# (unbounded RSS; runs/r4/record_whip_obs*.log) - bound each attempt with
# timeout + an address-space ulimit and retry.
cd /root/repo
OUT=tests/fixtures/whip_rope_ref_obs.npz
for i in $(seq 1 12); do
  if [ -f "$OUT" ]; then echo "fixture exists; done"; exit 0; fi
  echo "=== attempt $i $(date) ==="
  ( ulimit -v $((48 * 1024 * 1024)); \
    WHIP_STEPS=10 JAX_PLATFORMS=cpu timeout 1500 \
    python scripts/record_whip_rope_obs.py ) \
    >> runs/r5/record_whip_obs.log 2>&1
  rc=$?
  echo "attempt $i rc=$rc" | tee -a runs/r5/record_whip_obs.log
  if [ $rc -eq 0 ] && [ -f "$OUT" ]; then echo "SUCCESS at attempt $i"; exit 0; fi
  sleep 5
done
echo "all attempts failed"
exit 1
