#!/bin/bash
# Round-3k one-chip queue: on-chip numbers for the two BASELINE.json configs
# that never had one —
#   config 3: SPS front-end (matched filter + timing recovery) -> classifier
#   config 2: ViT-Tiny 2016.10a geometry (d64/L4, 16x16 images, 11-class)
# Each step bounded + logged; steps are independent (a failure skips on).
set -u
cd "$(dirname "$0")/.."

echo "=== 1. sps_infer bench (sps=2, Gardner TED) ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('sps_infer', timing_method='gardner'), indent=2))
" 2>&1 | tee /tmp/r3k_sps_gardner.log

echo "=== 2. sps_infer bench (sps=2, simple_energy pick) ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('sps_infer', timing_method='simple_energy'), indent=2))
" 2>&1 | tee /tmp/r3k_sps_energy.log

echo "=== 3. vit_tiny (d64/L4, 16x16) on-chip parity ==="
timeout 2400 python -u scripts/tpu_check_fused.py tiny 256 \
  2>&1 | tee /tmp/r3k_tiny_parity.log

echo "=== 4. vit_tiny serving bench ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('vit_tiny_infer'), indent=2))
" 2>&1 | tee /tmp/r3k_tiny_bench.log

echo "ROUND3K QUEUE COMPLETE"
