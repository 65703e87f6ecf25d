#!/bin/bash
# Round-3as follow-up: the p1 pack accumulator (+1.57 MB net at seg-64 mp
# D=128/hw=1024) OOM'd the stash G=40 rung by 1.39 MB (17.39 vs 16.00);
# 'full' OOM'd by 8.54 MB (its [3D+hw,5D+hw] pack is mostly off-diagonal
# waste at hw=1024 — dead at this geometry). Measure p1 at the next rungs
# down vs the DWPACK=0 G=40 baseline (29.46 ms this session): the pack can
# only win if the ~2.7 ms dW-serialization saving beats the G 40->32 rung
# loss (~5% = 1.5 ms on the 3y ladder).
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
echo "=== seg-64 mp @ 8192, p1 G ladder (baseline off/G40 = 29.46 ms) ==="
tr rawiq_seg64_mp 8192 VITIQ_TRAIN_DWPACK=p1 VITIQ_TRAIN_G=36 2>&1 | tee /tmp/r3as2_seg64_p1_g36.log
tr rawiq_seg64_mp 8192 VITIQ_TRAIN_DWPACK=p1 VITIQ_TRAIN_G=32 2>&1 | tee /tmp/r3as2_seg64_p1_g32.log
echo "ROUND3AS2 QUEUE COMPLETE"
