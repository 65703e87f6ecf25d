#!/bin/bash
# Round-3v: confirm the kernoff structural cost scales with grid-step count.
# kernoff kernels are copies, so VMEM is tiny and G can be forced high:
#   G=16  — divides 8192 exactly (also isolates the G=24 padding cost)
#   G=64  — 128 grid steps/call
#   G=512 — 16 grid steps/call (floor: launch + XLA glue only)
set -u
cd "$(dirname "$0")/.."
for g in 16 64 512; do
  echo "--- kernoff G=$g 8192 ---"
  VITIQ_TRAIN_PROBE=kernoff VITIQ_TRAIN_G=$g timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3v_kernoff_g$g.log
done
echo "ROUND3V QUEUE COMPLETE"
