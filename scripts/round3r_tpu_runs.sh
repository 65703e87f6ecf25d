#!/bin/bash
# Round-3r: the merged-dW auto default covers Lp<=32, but only Lp=16 was
# perf-measured (3m). A/B the seg-64 CLS geometry (17 tokens -> Lp=32,
# G=8) to confirm merged is not a regression where the K pad is 4x.
set -u
cd "$(dirname "$0")/.."
for mode in merged batched; do
  echo "--- seg64 CLS (Lp=32) dW=$mode ---"
  VITIQ_TRAIN_DW=$mode timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64', 2048)))
" 2>&1 | tee /tmp/r3r_cls_$mode.log
done
echo "ROUND3R QUEUE COMPLETE"
