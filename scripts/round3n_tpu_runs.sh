#!/bin/bash
# Round-3n one-chip queue (post 3k/3m):
#   1. BASELINE config-2 accuracy proxy: vit_tiny 2016.10a trained to
#      convergence at the reference regime (artifacts under result/proxy2016)
#   2. rawIQ seg-16 CLS fused train step — the one unmeasured
#      train_roofline.py row (SOL 103.1K; Lp=80 -> auto keeps batched dW)
#   3. warm the driver-bench configs in the fresh compile cache
#      (bench.py runs vit + rawiq_seg64_mp at round end)
set -u
cd "$(dirname "$0")/.."

echo "=== 1. vit_tiny 2016.10a convergence proxy (tpu numerics) ==="
timeout 5400 python -u scripts/proxy_vit_tiny.py 100 2048 tpu \
  2>&1 | tee /tmp/r3n_tiny_proxy.log

echo "=== 2. rawIQ seg-16 CLS train step (roofline row) ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq', 2048)))
" 2>&1 | tee /tmp/r3n_rawiq_train.log

echo "=== 3. driver-bench warm (vit + rawiq_seg64_mp) ==="
timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3n_bench_warm.log

echo "ROUND3N QUEUE COMPLETE"
