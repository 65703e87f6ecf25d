#!/bin/bash
# Round-4b TPU ladder — VERDICT r3 item 3 follow-ups on the rawIQ train
# geometries the stash auto-gate excludes:
#   * forced STASH at Lp=80 (flagship CLS) and d256 (best / best_mp) at
#     batches where the per-layer stash fits HBM,
#   * the round-3aw XPACK RECOMPUTE core (VITIQ_TRAIN_RFWD/RBWD) that the
#     recompute regime never certified on chip.
# Appends JSON lines to /tmp/r4_ladder.jsonl like round4_tpu_runs.sh.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_ladder.jsonl
run() {
  local tag="$1"; shift
  if grep -q "\"tag\": \"$tag\"" "$LOG" 2>/dev/null; then
    echo "=== $tag already recorded, skipping ==="
    return
  fi
  echo "=== $tag ($(date +%H:%M:%S)) env: $* ==="
  env "$@" timeout 1500 python -u - "$tag" <<'EOF'
import json, os, sys
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
tag = sys.argv[1]
arm, batch = os.environ["R4_ARM"], int(os.environ["R4_BATCH"])
kind = os.environ.get("R4_KIND", "train")
from vitiq.bench import bench_train_step, bench_fused_infer
try:
    res = (bench_train_step(arm, batch) if kind == "train"
           else bench_fused_infer(arm, batch))
    out = {"tag": tag, "arm": arm, "batch": batch,
           "fps": res["value"],
           "knobs": {k: v for k, v in os.environ.items()
                     if k.startswith("VITIQ_")}}
except Exception as e:
    out = {"tag": tag, "arm": arm, "batch": batch,
           "error": f"{type(e).__name__}: {str(e)[:300]}"}
print("R4RESULT " + json.dumps(out), flush=True)
with open("/tmp/r4_ladder.jsonl", "a") as f:
    f.write(json.dumps(out) + "\n")
EOF
}

# ---- flagship rawiq (d128/L6/seg16 CLS, Lp=80): stash + xpack recompute ----
run t_rawiq_8192_stash  R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_STASH=1
run t_rawiq_8192_rfwdx  R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_RFWD=xpack
run t_rawiq_8192_rbothx R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_RFWD=xpack VITIQ_TRAIN_RBWD=xpack
# ---- rawiq_best (d256/L9/seg16 CLS, Lp=80): xpack recompute + small-batch stash ----
run t_best_8192_rfwdx   R4_ARM=rawiq_best R4_BATCH=8192 VITIQ_TRAIN_RFWD=xpack
run t_best_8192_rbothx  R4_ARM=rawiq_best R4_BATCH=8192 VITIQ_TRAIN_RFWD=xpack VITIQ_TRAIN_RBWD=xpack
run t_best_2048_stash   R4_ARM=rawiq_best R4_BATCH=2048 VITIQ_TRAIN_STASH=1
run t_best_4096_stash   R4_ARM=rawiq_best R4_BATCH=4096 VITIQ_TRAIN_STASH=1
# ---- rawiq_best_mp (d256/L9/seg16 mean-pool, Lp=64): the padded-row-free best geometry ----
run t_bestmp_8192_base  R4_ARM=rawiq_best_mp R4_BATCH=8192
run t_bestmp_4096_stash R4_ARM=rawiq_best_mp R4_BATCH=4096 VITIQ_TRAIN_STASH=1
run t_bestmp_8192_rbothx R4_ARM=rawiq_best_mp R4_BATCH=8192 VITIQ_TRAIN_RFWD=xpack VITIQ_TRAIN_RBWD=xpack

# ---- VERDICT r3 item 7: hybrid Gardner e2e on chip (vs the 6.3K full-loop floor) ----
sps_run() {
  local tag="$1" method="$2" window="$3"
  if grep -q "\"tag\": \"$tag\"" "$LOG" 2>/dev/null; then
    echo "=== $tag already recorded, skipping ==="
    return
  fi
  echo "=== $tag ($(date +%H:%M:%S)) method=$method window=$window ==="
  timeout 1500 python -u - "$tag" "$method" "$window" <<'EOF'
import json, sys
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
tag, method, window = sys.argv[1], sys.argv[2], int(sys.argv[3])
import functools
import vitiq.dsp as dsp
if window != 64:
    # rebind the batched default for the A/B (0 = full contract loop);
    # bench_sps_infer resolves `from vitiq.dsp import preprocess_batch_sps`
    # at call time, so patch the package namespace
    dsp.preprocess_batch_sps = functools.partial(dsp.preprocess_batch_sps,
                                                 hybrid_window=window)
from vitiq.bench import bench_sps_infer
try:
    res = bench_sps_infer(method=method)
    out = {"tag": tag, "method": method, "hybrid_window": window,
           "fps": res["value"], "batch": res["batch_size"]}
except Exception as e:
    out = {"tag": tag, "method": method, "hybrid_window": window,
           "error": f"{type(e).__name__}: {str(e)[:300]}"}
print("R4RESULT " + json.dumps(out), flush=True)
with open("/tmp/r4_ladder.jsonl", "a") as f:
    f.write(json.dumps(out) + "\n")
EOF
}
sps_run sps_gardner_hybrid64 gardner 64
sps_run sps_mm_hybrid64      mueller_muller 64
sps_run sps_gardner_full     gardner 0
echo "LADDER4B DONE"
