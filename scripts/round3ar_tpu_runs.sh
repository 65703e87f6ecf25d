#!/bin/bash
# Round-3ar: fresh AMORTIZED decomposition of the train step at the
# post-campaign defaults (stash + xpack fwd + fullprod/wide/blk attention
# bwd + merged dW + fused embed/opt). The last full surgery pass (round 3t)
# predates stash/fullprod/xpack-fwd — the buckets have all moved. Probes
# are TIMING-ONLY (wrong outputs); deltas vs baseline attribute the step.
#   kernoff   -> out-of-kernel glue bound (embed/head/loss/AdamW/launches)
#   fwdonly   -> + stash-rebuild share (qkv+FFN1 GEMMs under stash)
#   noattnbwd -> attention-backward share
#   nodw      -> dW GEMM share
#   noacc     -> accumulator cross-step traffic share
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
echo "=== seg-64 mp @ 8192 (3aq record 29.48 ms) ==="
for p in "" kernoff fwdonly noattnbwd nodw noacc; do
  echo "--- probe=${p:-baseline} ---"
  env_args=()
  [ -n "$p" ] && env_args=(VITIQ_TRAIN_PROBE=$p)
  tr rawiq_seg64_mp 8192 "${env_args[@]}" 2>&1 | tee /tmp/r3ar_seg64_${p:-base}.log
done
echo "=== vit_tiny @ 8192 (3aq 28.01 ms) ==="
for p in "" kernoff; do
  echo "--- probe=${p:-baseline} ---"
  env_args=()
  [ -n "$p" ] && env_args=(VITIQ_TRAIN_PROBE=$p)
  tr vit_tiny 8192 "${env_args[@]}" 2>&1 | tee /tmp/r3ar_tiny_${p:-base}.log
done
echo "ROUND3AR QUEUE COMPLETE"
