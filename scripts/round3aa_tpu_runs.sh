#!/bin/bash
# Round-3aa: multi-tile stash on the big geometries (forced STASH=1; auto
# stays Lp<=32 until these measure). Amortized baselines from round 3x:
# rawiq flagship 69.72 ms @ 2048, vit flagship 118.66 ms @ 2048.
# Also the flagship stash G ladder: the recompute backward's estimate
# pinned G=2; the stash backward is much lighter.
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
echo "--- rawiq flagship stash auto-G (2048) ---"
run rawiq 2048 VITIQ_TRAIN_STASH=1 2>&1 | tee /tmp/r3aa_flag_stash.log
echo "--- rawiq flagship stash G=4 ---"
run rawiq 2048 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=4 2>&1 | tee /tmp/r3aa_flag_g4.log
echo "--- rawiq flagship stash G=8 ---"
run rawiq 2048 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=8 2>&1 | tee /tmp/r3aa_flag_g8.log
echo "--- vit flagship stash auto-G (2048) ---"
run vit 2048 VITIQ_TRAIN_STASH=1 2>&1 | tee /tmp/r3aa_vit_stash.log
echo "ROUND3AA QUEUE COMPLETE"
