#!/bin/bash
# Round-3ac: G ladders re-probed under honest amortized timing. The old
# "flagship train ladder is flat" verdict was measured per-call, where
# the ~25 ms/step relay tax diluted ratios and +-10% noise hid deltas.
# Also: seg-64 CLS (Lp=32) stash G ladder (auto G=8 is the conservative
# recompute-era estimate; the stash backward is lighter), and vit_tiny
# at the new stash G=40 default.
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
echo "--- rawiq flagship G=3 (baseline 69.72 @ auto) ---"
run rawiq 2048 VITIQ_TRAIN_G=3 2>&1 | tee /tmp/r3ac_flag_g3.log
echo "--- rawiq flagship G=4 ---"
run rawiq 2048 VITIQ_TRAIN_G=4 2>&1 | tee /tmp/r3ac_flag_g4.log
echo "--- vit flagship G=3 (baseline 118.66 @ auto) ---"
run vit 2048 VITIQ_TRAIN_G=3 2>&1 | tee /tmp/r3ac_vit_g3.log
echo "--- vit flagship G=4 ---"
run vit 2048 VITIQ_TRAIN_G=4 2>&1 | tee /tmp/r3ac_vit_g4.log
echo "--- vit_tiny re-run at stash G=40 default ---"
run vit_tiny 8192 2>&1 | tee /tmp/r3ac_tiny.log
echo "--- seg64 CLS stash G=12 (auto G=8 baseline 112.57) ---"
run rawiq_seg64 8192 VITIQ_TRAIN_G=12 2>&1 | tee /tmp/r3ac_cls_g12.log
echo "--- seg64 CLS stash G=16 ---"
run rawiq_seg64 8192 VITIQ_TRAIN_G=16 2>&1 | tee /tmp/r3ac_cls_g16.log
echo "ROUND3AC QUEUE COMPLETE"
