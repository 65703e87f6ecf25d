#!/bin/bash
# Round-3p one-chip queue: certify + re-headline after the round-3o picker
# extension (Lp<=16 train G ladder -> G=32 default) and the f32 FD fix in
# tpu_check_train.
set -u
cd "$(dirname "$0")/.."

echo "=== 1. chain-core train check at the seg-64 shape (L=16, new G=32) ==="
timeout 2400 python -u scripts/tpu_check_train.py 64 16 \
  2>&1 | tee /tmp/r3p_chain_check16.log

echo "=== 2. xpack train check at L=16 (f32 FD re-run) ==="
VITIQ_TRAIN_ATTN=xpack timeout 2400 python -u scripts/tpu_check_train.py 64 16 \
  2>&1 | tee /tmp/r3p_xpack_check16.log

echo "=== 3. seg-64 mp train at the new auto default (G=32) ==="
for b in 2048 8192; do
  echo "--- batch $b ---"
  timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', $b)))
" 2>&1 | tee /tmp/r3p_auto_b$b.log
done
echo "ROUND3P QUEUE COMPLETE"
