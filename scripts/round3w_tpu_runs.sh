#!/bin/bash
# Round-3w: the train bench gets the serving benches' async-queue timing
# (enqueue inner steps, ONE loss fetch drains the FIFO). The old per-call
# loop fetched the loss every step = a host<->relay round trip charged to
# every step. Same-session A/B: amortized vs percall, plus kernoff under
# amortized timing (the true out-of-kernel floor).
set -u
cd "$(dirname "$0")/.."
run() {
  timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 8192)))
"
}
echo "--- amortized baseline 8192 ---"
run 2>&1 | tee /tmp/r3w_amort_base.log
echo "--- percall baseline 8192 (same session) ---"
VITIQ_TRAIN_TIMING=percall run 2>&1 | tee /tmp/r3w_percall_base.log
echo "--- amortized kernoff 8192 ---"
VITIQ_TRAIN_PROBE=kernoff run 2>&1 | tee /tmp/r3w_amort_kernoff.log
echo "--- amortized fwdonly 8192 ---"
VITIQ_TRAIN_PROBE=fwdonly run 2>&1 | tee /tmp/r3w_amort_fwdonly.log
echo "--- amortized noattnbwd 8192 ---"
VITIQ_TRAIN_PROBE=noattnbwd run 2>&1 | tee /tmp/r3w_amort_noattnbwd.log
echo "ROUND3W QUEUE COMPLETE"
