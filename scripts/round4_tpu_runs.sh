#!/bin/bash
# Round-4 TPU ladders: VERDICT item 3 (rawiq flagship/best train) and
# item 4 (flagship ViT serving attribution). Sequential; each run bounded.
# Results append to /tmp/r4_ladder.jsonl via the bench JSON prints.
set -u
LOG=/tmp/r4_ladder.jsonl
run() {
  local tag="$1"; shift
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

# ---- item 3: rawiq flagship (d128/L6/seg16, Lp=80) train ladder ----
run t_rawiq_2048_base   R4_ARM=rawiq R4_BATCH=2048
run t_rawiq_8192_base   R4_ARM=rawiq R4_BATCH=8192
run t_rawiq_8192_G6     R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_G=6
run t_rawiq_8192_merged R4_ARM=rawiq R4_BATCH=8192 VITIQ_TRAIN_DW=merged
run t_rawiq_2048_stash  R4_ARM=rawiq R4_BATCH=2048 VITIQ_TRAIN_STASH=1
# ---- item 3: rawiq_best (d256/L9/seg16) train ----
run t_best_2048_base    R4_ARM=rawiq_best R4_BATCH=2048
run t_best_2048_G4      R4_ARM=rawiq_best R4_BATCH=2048 VITIQ_TRAIN_G=4
run t_best_8192_base    R4_ARM=rawiq_best R4_BATCH=8192
# ---- item 4: flagship ViT serving attribution (Lp=144) ----
run s_vit_base          R4_ARM=vit R4_BATCH=8192 R4_KIND=serve
run s_vit_noattn        R4_ARM=vit R4_BATCH=8192 R4_KIND=serve VITIQ_V3_PROBE=noattn
run s_vit_noscore       R4_ARM=vit R4_BATCH=8192 R4_KIND=serve VITIQ_V3_PROBE=noscore
run s_vit_nopv          R4_ARM=vit R4_BATCH=8192 R4_KIND=serve VITIQ_V3_PROBE=nopv
echo "LADDER DONE"
