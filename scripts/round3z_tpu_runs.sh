#!/bin/bash
# Round-3z: certify the stash auto-default (VITIQ_TRAIN_STASH=auto at
# Lp<=32, G=32 at Lp<=16) across its covered geometries + the G=40 probe.
set -u
cd "$(dirname "$0")/.."
run() { # arm batch [env...]
  local arm=$1 batch=$2; shift 2
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('$arm', $batch)))
"
}
echo "--- seg64 mp 8192 auto (expect ~49.8ms G=32 stash) ---"
run rawiq_seg64_mp 8192 2>&1 | tee /tmp/r3z_mp8192.log
echo "--- seg64 mp 2048 auto ---"
run rawiq_seg64_mp 2048 2>&1 | tee /tmp/r3z_mp2048.log
echo "--- seg64 CLS 8192 auto (Lp=32 stash, G unchanged) ---"
run rawiq_seg64 8192 2>&1 | tee /tmp/r3z_cls8192.log
echo "--- vit_tiny 8192 auto ---"
run vit_tiny 8192 2>&1 | tee /tmp/r3z_tiny8192.log
echo "--- seg64 mp 8192 stash G=40 probe ---"
run rawiq_seg64_mp 8192 VITIQ_TRAIN_G=40 2>&1 | tee /tmp/r3z_g40.log
echo "ROUND3Z QUEUE COMPLETE"
