#!/bin/bash
# Round-3s: train-backward surgery probes (VITIQ_TRAIN_PROBE — timing-only,
# wrong outputs) to attribute the execution wall at the two train
# geometries. Baselines: seg-64 mp 45-50K @ 2048 (G=24, relay variance
# +-10%), flagship 14.0K @ 2048. Probe semantics in fused_layer_train.py.
# NOTE round-2.6 lesson: deltas may NOT add up (ops ride in scheduling
# slack) — interpret each bound individually.
set -u
cd "$(dirname "$0")/.."
for arm in rawiq_seg64_mp vit; do
  for probe in fwdonly noattnbwd nodw noacc; do
    echo "--- $arm probe=$probe ---"
    VITIQ_TRAIN_PROBE=$probe timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('$arm', 2048)))
" 2>&1 | tee /tmp/r3s_${arm}_$probe.log
  done
done
echo "ROUND3S QUEUE COMPLETE"
