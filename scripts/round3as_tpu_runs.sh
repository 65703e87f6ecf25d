#!/bin/bash
# Round-3as: on-chip A/B of the packed dW full product (VITIQ_TRAIN_DWPACK,
# round-3ar mechanism: the four per-site dW GEMMs measured 4.12 ms of the
# 29.41 ms seg-64 mp step = ~5 us/GEMM serialization x 205 grid steps; p1
# merges the three D-wide ones into ONE product per step, full folds dw2 in
# too). Amortized bench_train_step; baseline = DWPACK=0 (the 3aq program).
# If p1/full hard-OOM the scoped-VMEM compile at the stash G rung, the
# G=32 fallback rows measure the pack at the next rung down.
set -u
cd "$(dirname "$0")/.."
tr() { # arm batch [env...]
  local arm=$1 batch=$2; shift 2
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('$arm', $batch)))
"
}
echo "=== seg-64 mp @ 8192 (baseline 29.41 ms this session) ==="
tr rawiq_seg64_mp 8192 VITIQ_TRAIN_DWPACK=0    2>&1 | tee /tmp/r3as_seg64_off.log
tr rawiq_seg64_mp 8192 VITIQ_TRAIN_DWPACK=p1   2>&1 | tee /tmp/r3as_seg64_p1.log
tr rawiq_seg64_mp 8192 VITIQ_TRAIN_DWPACK=full 2>&1 | tee /tmp/r3as_seg64_full.log
echo "=== vit_tiny @ 8192 (baseline 28.0 ms 3aq) ==="
tr vit_tiny 8192 VITIQ_TRAIN_DWPACK=p1   2>&1 | tee /tmp/r3as_tiny_p1.log
tr vit_tiny 8192 VITIQ_TRAIN_DWPACK=full 2>&1 | tee /tmp/r3as_tiny_full.log
echo "ROUND3AS QUEUE COMPLETE"
