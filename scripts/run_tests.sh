#!/usr/bin/env bash
# Full test suite, one pytest process per test file.
#
# Why not a single `pytest tests/`: ~170 tests compile hundreds of XLA
# programs in one process; by test ~150 the accumulated native allocations
# cross a limit inside the volumetric-renderer compile and the process
# SIGSEGVs (round-2 verdict, "What's weak" #1) even though every file passes
# in isolation. Per-file processes bound memory and give the same coverage.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

pass=0; fail=0; failed_files=()
start=$(date +%s)
for f in tests/test_*.py; do
  t0=$(date +%s)
  if python -m pytest "$f" -q "$@" > /tmp/unidom_test_out.txt 2>&1; then
    echo "PASS $f ($(( $(date +%s) - t0 ))s): $(tail -1 /tmp/unidom_test_out.txt)"
    pass=$((pass+1))
  else
    echo "FAIL $f ($(( $(date +%s) - t0 ))s)"
    tail -30 /tmp/unidom_test_out.txt
    fail=$((fail+1)); failed_files+=("$f")
  fi
done
echo "----------------------------------------"
echo "files: $((pass+fail))  passed: $pass  failed: $fail  ($(( $(date +%s) - start ))s total)"
if [ "$fail" -gt 0 ]; then
  echo "failed: ${failed_files[*]}"
  exit 1
fi
