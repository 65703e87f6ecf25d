#!/bin/bash
# Round-3at: FRESH amortized decomposition of the seg-64 mp train step at
# the current composed defaults (stash + xpack fwd + fullprod dV/dK + wide
# softmax bwd + block-diag dP/dQ + fused raw embed + flat AdamW; G=40).
# The last full attribution (round 3t/3w) predates every one of those
# mechanisms. All runs amortized @ 8192 (bench_train_step queue-drain);
# probe deltas vs the no-probe baseline attribute the remaining 29.4 ms.
set -u
cd "$(dirname "$0")/.."
tr() { # tag [env...]
  local tag=$1; shift
  echo "=== probe: $tag ==="
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3at_${tag}.log | grep -E '"metric"|Error|exceeded'
}
tr base
tr kernoff   VITIQ_TRAIN_PROBE=kernoff
tr fwdonly   VITIQ_TRAIN_PROBE=fwdonly
tr noattnbwd VITIQ_TRAIN_PROBE=noattnbwd
tr attn_nodv VITIQ_TRAIN_PROBE=attn_nodv
tr attn_nodsp VITIQ_TRAIN_PROBE=attn_nodsp
tr attn_nodq VITIQ_TRAIN_PROBE=attn_nodq
tr attn_nodk VITIQ_TRAIN_PROBE=attn_nodk
tr nodw      VITIQ_TRAIN_PROBE=nodw
tr noacc     VITIQ_TRAIN_PROBE=noacc
echo "ROUND3AT QUEUE COMPLETE"
