#!/bin/bash
# Round-3o one-chip queue: attack the small-Lp train-kernel EXECUTION wall
# (post 3m: seg-64 mp train = 47.4K frames/s = 7.1% of its merged-dW pass
# ceiling — no longer pass-bound). Two mechanisms the flagship ledger does
# NOT rule out at this geometry:
#   a. train G ladder beyond _pick_g's 16 cap (VMEM estimate ~0.34 MB/G at
#      Lp=16; the serving small-Lp ladder was +31% G=4->16 and serves G=64)
#   b. the xpack train core (lost at flagship G<=2; seg-64 trains at G=16 —
#      exactly the "higher G" regime the round-3b ledger leaves open)
set -u
cd "$(dirname "$0")/.."

echo "=== 1. xpack train grad parity on chip at the seg-64 shape (L=16) ==="
VITIQ_TRAIN_ATTN=xpack timeout 2400 python -u scripts/tpu_check_train.py 16 16 \
  2>&1 | tee /tmp/r3o_xpack_check.log

echo "=== 2. train G ladder at seg-64 mp (chain core, auto merged dW) ==="
for g in 24 32 48; do
  echo "--- G=$g ---"
  VITIQ_TRAIN_G=$g timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 2048)))
" 2>&1 | tee /tmp/r3o_g$g.log
done

echo "=== 3. xpack train core at seg-64 mp ==="
VITIQ_TRAIN_ATTN=xpack timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', 2048)))
" 2>&1 | tee /tmp/r3o_xpack_bench.log

echo "=== 4. batch scaling at the 3m default (auto G, merged dW) ==="
for b in 4096 8192; do
  echo "--- batch $b ---"
  timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('rawiq_seg64_mp', $b)))
" 2>&1 | tee /tmp/r3o_b$b.log
done
echo "ROUND3O QUEUE COMPLETE"
