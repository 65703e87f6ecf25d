#!/bin/bash
# Round-4c TPU ladder — G-rung follow-ups from the r4/r4b results:
#   * d256/L9 (rawiq_best): G4 recompute beat base +14.6% @2048 — walk the
#     rung up and carry it to batch 8192; stash fits at <=4096 — walk its
#     rung too (stash frees VMEM -> higher G elsewhere).
#   * flagship rawiq Lp=80: stash now default (auto) — confirm the auto
#     path reproduces the forced number and walk its G rung.
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

# ---- rawiq_best (d256/L9) recompute G rung @ 2048 + carry winner to 8192 ----
run t_best_2048_G5     R4_ARM=rawiq_best R4_BATCH=2048 VITIQ_TRAIN_G=5
run t_best_2048_G6     R4_ARM=rawiq_best R4_BATCH=2048 VITIQ_TRAIN_G=6
run t_best_8192_G4     R4_ARM=rawiq_best R4_BATCH=8192 VITIQ_TRAIN_G=4
run t_best_8192_G6     R4_ARM=rawiq_best R4_BATCH=8192 VITIQ_TRAIN_G=6
# ---- rawiq_best stash G rung @ 4096 (stash VMEM differs from recompute) ----
run t_best_4096_stG4   R4_ARM=rawiq_best R4_BATCH=4096 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=4
run t_best_4096_stG6   R4_ARM=rawiq_best R4_BATCH=4096 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=6
# ---- batch-matched controls for the stash-vs-recompute A/B at d256 ----
run t_best_4096_base   R4_ARM=rawiq_best R4_BATCH=4096
run t_bestmp_4096_base R4_ARM=rawiq_best_mp R4_BATCH=4096
run t_bestmp_4096_stG4 R4_ARM=rawiq_best_mp R4_BATCH=4096 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=4
run t_bestmp_4096_G4   R4_ARM=rawiq_best_mp R4_BATCH=4096 VITIQ_TRAIN_G=4
# ---- flagship rawiq Lp=80: auto now = stash; confirm + walk the stash G rung ----
run t_rawiq_8192_auto  R4_ARM=rawiq R4_BATCH=8192
run t_rawiq_8192_stG8  R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=8
run t_rawiq_8192_stG10 R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_STASH=1 VITIQ_TRAIN_G=10
echo "LADDER4C DONE"
