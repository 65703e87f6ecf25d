#!/bin/bash
# Round-3h one-chip queue: the mean-pool seg-64 geometry (Lp=16) — the
# served shape whose pass-arithmetic ceiling (2.82M frames/s) crosses the
# 1M north star. Parity first, then the G ladder, batch ladder, and the
# decomposition probes. Steps are independent (a failure skips on); each is
# bounded so a relay wedge costs one step.
set -u
cd "$(dirname "$0")/.."

echo "=== 1. seg64 MEAN-POOL on-chip parity (auto route, picker G) ==="
timeout 2400 python -u scripts/tpu_check_fused.py seg64mp 64 \
  2>&1 | tee /tmp/r3h_mp_parity.log

echo "=== 2. seg64 CLS on-chip parity (re-cert at the new G=32 pick) ==="
timeout 2400 python -u scripts/tpu_check_fused.py seg64 64 \
  2>&1 | tee /tmp/r3h_cls_parity.log

echo "=== 3. seg64 MEAN-POOL bench @ 16384 (driver-style) ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('rawiq64_mp_infer'), indent=2))
" 2>&1 | tee /tmp/r3h_mp_bench.log

echo "=== 4. G ladder (full_mp @ 16384) ==="
for g in 16 32 64 96; do
  echo "--- VITIQ_V3_G=$g ---"
  VITIQ_V3_G=$g timeout 2400 python -u scripts/tpu_probe_seg64.py full_mp 16384 16 \
    2>&1 | tee /tmp/r3h_mp_g$g.log
done

echo "=== 5. batch ladder at the picker G ==="
for b in 32768 65536; do
  timeout 2400 python -u scripts/tpu_probe_seg64.py full_mp $b 8 \
    2>&1 | tee /tmp/r3h_mp_b$b.log
done

echo "=== 6. decomposition: pre / layersS_mp / full_mp @ 16384 ==="
timeout 2400 python -u scripts/tpu_probe_seg64.py pre 16384 16 \
  2>&1 | tee /tmp/r3h_pre.log
timeout 2400 python -u scripts/tpu_probe_seg64.py layersS_mp 16384 16 \
  2>&1 | tee /tmp/r3h_layers_mp.log
timeout 2400 python -u scripts/tpu_probe_seg64.py full_mp 16384 16 \
  2>&1 | tee /tmp/r3h_full_mp.log

echo "=== 7. seg64 CLS bench at the new G=32 default ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('rawiq64_infer'), indent=2))
" 2>&1 | tee /tmp/r3h_cls_bench.log

echo "=== 8. seg-16 MEAN-POOL bench (Lp 80->64) ==="
timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import run_benchmarks
print(json.dumps(run_benchmarks('rawiq_mp_infer'), indent=2))
" 2>&1 | tee /tmp/r3h_seg16mp_bench.log

echo "ROUND3H QUEUE COMPLETE"
