#!/bin/bash
# Round-3g one-chip queue (run AFTER the rawiq gate campaign frees the chip):
#   1. d256/L9 (rawiq_best geometry) on-chip parity + serving bench
#   2. 24-class proxy head-to-head (full RadioML list incl. analog)
# Each step bounded + logged; steps are independent (a failure skips on).
set -u
cd "$(dirname "$0")/.."

echo "=== 1. rawiq_best (d256/L9/seg16) on-chip parity ==="
timeout 2400 python -u scripts/tpu_check_fused.py best 64 \
  2>&1 | tee /tmp/r3g_best_parity.log

echo "=== 2. rawiq_best serving bench ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('rawiq_best_infer'), indent=2))
" 2>&1 | tee /tmp/r3g_best_bench.log

echo "=== 3. 24-class proxy head-to-head (reference regime) ==="
timeout 7200 python -u scripts/proxy_head_to_head.py 100 2048 tpu 24 \
  2>&1 | tee /tmp/r3g_proxy24.log

echo "ROUND3G QUEUE COMPLETE"
