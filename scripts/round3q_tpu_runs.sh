#!/bin/bash
# Round-3q: certify the robust Lp<=16 train default (G=24) at both batches
# (G=32 measured batch-sensitive VMEM: compiled @2048, OOMed @8192).
set -u
cd "$(dirname "$0")/.."
for b in 2048 8192; do
  echo "--- auto (G=24) batch $b ---"
  timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', $b)))
" 2>&1 | tee /tmp/r3q_b$b.log
done
echo "ROUND3Q QUEUE COMPLETE"
