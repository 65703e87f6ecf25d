#!/bin/bash
# Round-3y: VITIQ_TRAIN_STASH on-chip A/B at seg-64 mp batch 8192.
# The stash fwd/bwd pair removes the backward's attention/LN/FFN2
# recompute (measured 10.9 ms of the 54.1 ms amortized step) at the cost
# of a ~24 KB/frame/layer stash round trip. The lighter backward may also
# unlock G=32/48 (the default bwd OOMs at G=32 @ 8192).
set -u
cd "$(dirname "$0")/.."
echo "--- on-chip stash grad parity (tpu_check_train, STASH=1) ---"
VITIQ_TRAIN_STASH=1 timeout 2400 python -u scripts/tpu_check_train.py 2>&1 | tee /tmp/r3y_parity.log
run() {
  timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
"
}
echo "--- amortized baseline (same session) ---"
run 2>&1 | tee /tmp/r3y_base.log
echo "--- stash G=24 (default) ---"
VITIQ_TRAIN_STASH=1 run 2>&1 | tee /tmp/r3y_stash_g24.log
echo "--- stash G=32 ---"
VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=32 run 2>&1 | tee /tmp/r3y_stash_g32.log
echo "--- stash G=48 ---"
VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=48 run 2>&1 | tee /tmp/r3y_stash_g48.log
echo "ROUND3Y QUEUE COMPLETE"
