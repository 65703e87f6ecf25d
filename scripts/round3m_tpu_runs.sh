#!/bin/bash
# Round-3m one-chip queue: merged-contraction weight-grad A/B
# (VITIQ_TRAIN_DW=merged — scripts/train_roofline.py predicts the four dW
# GEMMs are 68.5% of seg-64 train passes at an 8x K pad; merging G*Lp
# lifts that geometry's ceiling 268K -> 669K fps).
#   1. on-chip gradient parity of the merged path (Mosaic compile +
#      numerics — interpret mode cannot catch layout/store errors)
#   2. timing A/B: seg-64 mean-pool train step (merged vs batched)
#   3. timing A/B: flagship train step (model predicts ~+5% ceiling only)
set -u
cd "$(dirname "$0")/.."

echo "=== 1. merged-dW on-chip gradient parity (flagship layer) ==="
VITIQ_TRAIN_DW=merged timeout 2400 python -u scripts/tpu_check_train.py 16 \
  2>&1 | tee /tmp/r3m_check_merged.log

echo "=== 2. seg-64 mean-pool train step: merged vs batched ==="
for mode in merged batched; do
  echo "--- seg64_mp $mode ---"
  VITIQ_TRAIN_DW=$mode timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 2048)))
" 2>&1 | tee /tmp/r3m_mp_train_$mode.log
done

echo "=== 3. flagship train step: merged vs batched ==="
for mode in merged batched; do
  echo "--- vit $mode ---"
  VITIQ_TRAIN_DW=$mode timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('vit', 2048)))
" 2>&1 | tee /tmp/r3m_vit_train_$mode.log
done
echo "ROUND3M QUEUE COMPLETE"
