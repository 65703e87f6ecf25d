#!/bin/bash
# Round-3 long TPU runs, executed sequentially (ONE chip — no interleaving).
# Detach with:  bash scripts/round3_tpu_runs.sh > /tmp/round3_runs.log 2>&1 &
# Logs: /tmp/round3_*.log
set -x
cd "$(dirname "$0")/.."

echo "=== [1/4] two-arm head-to-head on the 19-class synthetic proxy ==="
python -u scripts/proxy_head_to_head.py 100 2048 tpu \
    > /tmp/round3_h2h.log 2>&1
tail -5 /tmp/round3_h2h.log

echo "=== [2/4] head-variant accuracy gate (10 seeds, full depth) ==="
python -u scripts/head_variant_validation.py 30 512 0,1,2,3,4,5,6,7,8,9 tpu \
    > /tmp/round3_gate.log 2>&1
tail -5 /tmp/round3_gate.log

echo "=== [3/4] out-of-core stream-train demo (8 GB corpus) ==="
python -u scripts/stream_train_demo.py 8 1 \
    > /tmp/round3_demo.log 2>&1
tail -5 /tmp/round3_demo.log

echo "=== [4/4] refreshed flagship bench (driver metric, batch 16384) ==="
python -u bench.py > /tmp/round3_bench.log 2>&1
tail -2 /tmp/round3_bench.log

echo "ROUND3 RUNS COMPLETE"
