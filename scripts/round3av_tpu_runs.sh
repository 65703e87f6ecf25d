#!/bin/bash
# Round-3av: amortized surgery decomposition of the BIG-Lp train step —
# the vit flagship (Lp=144, recompute chain; stash/xpack auto-gated off
# there) and the rawiq flagship (seg-16, Lp=80). These are the geometries
# the 3y-3aq campaign left on the recompute chain; the last attribution
# of EITHER predates fullprod-recompute/multi-tile (3al/3am) and the
# fused raw embed (3ap). Probe deltas vs base attribute the current step.
# Batch 8192 for timing stability (batch-2048 carries +-10% relay noise).
set -u
cd "$(dirname "$0")/.."
tr() { # arm tag [env...]
  local arm=$1 tag=$2; shift 2
  echo "=== probe: ${arm}/${tag} ==="
  env "$@" timeout 3000 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('${arm}', 8192)))
" 2>&1 | tee /tmp/r3av_${arm}_${tag}.log | grep -E '"metric"|Error|exceeded|RESOURCE'
}
for arm in vit rawiq; do
  tr $arm base
  tr $arm kernoff   VITIQ_TRAIN_PROBE=kernoff
  tr $arm fwdonly   VITIQ_TRAIN_PROBE=fwdonly
  tr $arm noattnbwd VITIQ_TRAIN_PROBE=noattnbwd
  tr $arm nodw      VITIQ_TRAIN_PROBE=nodw
  tr $arm noacc     VITIQ_TRAIN_PROBE=noacc
done
echo "ROUND3AV QUEUE COMPLETE"
