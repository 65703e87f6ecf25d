#!/bin/bash
# Round-3x: refresh the train-step record table under amortized timing
# (the pre-3w numbers carry ~25 ms/step of relay fetch tax), and A/B
# VITIQ_TRAIN_PB=reuse (cached probability tiles in the attention
# backward — now that attn bwd is measured at 34% of the true step).
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
echo "--- flagship (rawiq) train 2048 amortized ---"
run rawiq 2048 2>&1 | tee /tmp/r3x_flagship.log
echo "--- vit flagship train 2048 amortized ---"
run vit 2048 2>&1 | tee /tmp/r3x_vit.log
echo "--- seg64 CLS train 8192 amortized ---"
run rawiq_seg64 8192 2>&1 | tee /tmp/r3x_seg64cls.log
echo "--- vit_tiny train 8192 amortized ---"
run vit_tiny 8192 2>&1 | tee /tmp/r3x_tiny.log
echo "--- seg64 mp train 8192 PB=reuse ---"
run rawiq_seg64_mp 8192 VITIQ_TRAIN_PB=reuse 2>&1 | tee /tmp/r3x_pbreuse.log
echo "ROUND3X QUEUE COMPLETE"
