#!/bin/bash
# Round-3i one-chip queue:
#   1. pin the Lp=16 G choice: 32-vs-64 A/B at both batches (the round-3h
#      forced-G=64 16384 probe read 533K against 1.08-1.30M for the same
#      program in three other runs — re-measure before trusting a ladder)
#   2. CLS-vs-mean-pool accuracy gate at tpu numerics (serving numerics),
#      seeds 0-2 (the CPU f32 gate runs in parallel, separate ledger keys)
set -u
cd "$(dirname "$0")/.."

echo "=== 1. G A/B (full_mp) ==="
for b in 16384 32768; do
  for g in 32 64; do
    echo "--- B=$b G=$g ---"
    VITIQ_V3_G=$g timeout 1800 python -u scripts/tpu_probe_seg64.py full_mp $b 16 \
      2>&1 | tee /tmp/r3i_g${g}_b${b}.log
  done
done

echo "=== 2. pool gate (tpu numerics, seeds 0-2) ==="
for attempt in 1 2 3; do
  timeout 7200 python -u scripts/pool_gate.py 30 512 0,1,2 tpu 64
  rc=$?
  echo "pool gate attempt $attempt rc=$rc"
  [ $rc -eq 0 ] && break
done
echo "ROUND3I QUEUE COMPLETE"
