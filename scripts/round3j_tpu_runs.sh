#!/bin/bash
# Round-3j one-chip queue:
#   1. driver bench.py end-to-end (warms the exact round-end programs,
#      incl. the new seg-64 mean-pool secondary record)
#   2. mean-pool seg-64 fused TRAIN step (the 1M serving geometry's
#      training throughput)
#   3. STRONG pool gate: reference-proxy regime (60 epochs, 2048
#      frames/class — the head-to-head regime that reaches ~40% acc)
#      staged over seeds so partial progress lands in the ledger
set -u
cd "$(dirname "$0")/.."

echo "=== 1. driver bench.py (flagship + mp secondary) ==="
timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3j_bench.log

echo "=== 2. seg-64 mean-pool fused train step ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 2048), indent=2))
" 2>&1 | tee /tmp/r3j_mp_train.log

echo "=== 3. strong pool gate (60 ep, 2048 f/c, tpu numerics) ==="
for seeds in 0 0,1 0,1,2 0,1,2,3 0,1,2,3,4; do
  for attempt in 1 2; do
    echo "--- stage seeds=$seeds attempt $attempt ---"
    timeout 7200 python -u scripts/pool_gate.py 60 2048 "$seeds" tpu 64
    rc=$?
    echo "stage seeds=$seeds attempt $attempt rc=$rc"
    [ $rc -eq 0 ] && break
  done
done
echo "ROUND3J QUEUE COMPLETE"
