#!/bin/bash
# Staged, wedge-resilient driver for the rawIQ conv1d head gate.
#
# Stages grow the seed list so the H2-vs-H8 paired delta lands early
# (the inner loop is heads-major: seeds "0" completes H2 s0 first, then
# each wider list adds one seed across all three heads). Every attempt
# resumes from rawiq_head_runs.jsonl, so a relay wedge costs at most the
# in-flight run; `timeout` bounds each attempt (a 30-epoch conv1d run is
# ~30 min, three runs ~90 min -> 7200 s ceiling per attempt).
set -u
cd "$(dirname "$0")/.."

for seeds in 0 0,1 0,1,2; do
  for attempt in 1 2 3; do
    echo "=== stage seeds=$seeds attempt $attempt ==="
    timeout 7200 python -u scripts/rawiq_head_gate.py 30 512 "$seeds" tpu conv1d
    rc=$?
    echo "stage seeds=$seeds attempt $attempt rc=$rc"
    [ $rc -eq 0 ] && break
  done
done
echo "RAWIQ GATE CAMPAIGN COMPLETE"
