#!/bin/bash
# Round-3t: re-run the seg-64 mp backward surgery probes at batch 8192
# (baseline 97.8K / 83.8 ms), where probe deltas resolve above the +-10%
# small-batch relay variance that made the 2048 probe runs unreadable.
set -u
cd "$(dirname "$0")/.."
echo "--- baseline (no probe) 8192 re-run for same-session pairing ---"
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3t_base.log
for probe in fwdonly noattnbwd nodw noacc; do
  echo "--- probe=$probe 8192 ---"
  VITIQ_TRAIN_PROBE=$probe timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
" 2>&1 | tee /tmp/r3t_$probe.log
done
echo "ROUND3T QUEUE COMPLETE"
