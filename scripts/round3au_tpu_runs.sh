#!/bin/bash
# Round-3au: layer-stacked train calls (VITIQ_TRAIN_LPC) ladder at the
# seg-64 mp geometry. The 3at decomposition priced the out-of-kernel +
# grid-structure floor at 14.3 ms of the 29.6 ms step (12 pallas calls x
# 205 grid steps); stacking LPC layers per call divides the call count at
# the cost of per-layer stash blocks + weights + accumulators resident at
# once (lower feasible G). Ladder: auto-G rungs first, then stretch G.
set -u
cd "$(dirname "$0")/.."
tr() { # tag [env...]
  local tag=$1; shift
  echo "=== lpc probe: $tag ==="
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3au_${tag}.log | grep -E '"metric"|Error|exceeded|RESOURCE'
}
tr lpc2_g32 VITIQ_TRAIN_LPC=2
tr lpc3_g24 VITIQ_TRAIN_LPC=3
tr lpc6_g16 VITIQ_TRAIN_LPC=6 VITIQ_TRAIN_G=16
tr lpc2_g40 VITIQ_TRAIN_LPC=2 VITIQ_TRAIN_G=40
tr lpc3_g32 VITIQ_TRAIN_LPC=3 VITIQ_TRAIN_G=32
echo "ROUND3AU QUEUE COMPLETE"
