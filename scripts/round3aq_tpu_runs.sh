#!/bin/bash
# Round-3aq: on-chip A/B of the two glue mechanisms from the 3ap probes —
# (1) fused raw embedding (preprocess+fold+embed+CLS+PE as one GEMM,
#     VITIQ_FUSED_EMBED) and (2) flat fused clip+AdamW (VITIQ_FUSED_OPT).
# Amortized train timing (bench_train_step) and serving benches; baselines
# first (both knobs OFF = the round-3ao defaults), then each knob alone,
# then composed.
set -u
cd "$(dirname "$0")/.."
tr() { # arm batch [env...]
  local arm=$1 batch=$2; shift 2
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('$arm', $batch)))
"
}
inf() { # arm batch [env...]
  local arm=$1 batch=$2; shift 2
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_fused_infer
print(json.dumps(bench_fused_infer('$arm', $batch)))
"
}
echo "=== TRAIN: vit_tiny @ 8192 ==="
echo "--- baseline (both off; 3ao record 28.09 ms) ---"
tr vit_tiny 8192 VITIQ_FUSED_EMBED=0 VITIQ_FUSED_OPT=0 2>&1 | tee /tmp/r3aq_tiny_base.log
echo "--- +fused opt only ---"
tr vit_tiny 8192 VITIQ_FUSED_EMBED=0 2>&1 | tee /tmp/r3aq_tiny_opt.log
echo "--- +fused embed only ---"
tr vit_tiny 8192 VITIQ_FUSED_OPT=0 2>&1 | tee /tmp/r3aq_tiny_emb.log
echo "--- composed (new defaults) ---"
tr vit_tiny 8192 2>&1 | tee /tmp/r3aq_tiny_both.log
echo "=== TRAIN: seg-64 mp @ 8192 (3ao record 30.08 ms) ==="
tr rawiq_seg64_mp 8192 VITIQ_FUSED_EMBED=0 VITIQ_FUSED_OPT=0 2>&1 | tee /tmp/r3aq_seg64_base.log
tr rawiq_seg64_mp 8192 2>&1 | tee /tmp/r3aq_seg64_both.log
echo "=== TRAIN: flagships @ 2048 ==="
tr rawiq 2048 2>&1 | tee /tmp/r3aq_rawiq_both.log
tr vit 2048 2>&1 | tee /tmp/r3aq_vit_both.log
echo "=== SERVE: fused embed A/B ==="
inf rawiq_seg64_mp 32768 VITIQ_FUSED_EMBED=0 2>&1 | tee /tmp/r3aq_inf_seg64_base.log
inf rawiq_seg64_mp 32768 2>&1 | tee /tmp/r3aq_inf_seg64_emb.log
inf vit 16384 VITIQ_FUSED_EMBED=0 2>&1 | tee /tmp/r3aq_inf_vit_base.log
inf vit 16384 2>&1 | tee /tmp/r3aq_inf_vit_emb.log
inf vit_tiny 16384 2>&1 | tee /tmp/r3aq_inf_tiny_emb.log
echo "ROUND3AQ QUEUE COMPLETE"
