#!/bin/bash
# Round-3u: decompose the seg-64 mp train step's NON-backward 51.5 ms
# (round-3t fwdonly) into fwd-stack / recompute / out-of-kernel glue.
#   norecomp — bwd kernel skips the recompute, full backward on stand-ins
#              (baseline - norecomp = recompute cost)
#   kernoff  — both kernels reduce to copies
#              (kernoff = embed + head + loss + AdamW + launches + padding)
set -u
cd "$(dirname "$0")/.."
echo "--- baseline (no probe) 8192 re-run for same-session pairing ---"
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3u_base.log
for probe in norecomp kernoff; do
  echo "--- probe=$probe 8192 ---"
  VITIQ_TRAIN_PROBE=$probe timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3u_$probe.log
done
echo "ROUND3U QUEUE COMPLETE"
