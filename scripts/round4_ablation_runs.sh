#!/bin/bash
# Round-4 impairment-ablation ladder (VERDICT r3 item 1 done-criteria):
# which 2018.01A channel ingredient does the cross-arm ordering need?
# Rungs share the proxy19 regime (19 classes, 2048 frames/class, early
# stop) so they compare against docs/proxy19 (iid, ViT +6.06) and
# result/proxy19i (full chain, ViT +3.04 overall / rawIQ +2.55 @ -8 dB).
# Each rung ~25 min on the chip; artifacts under result/proxy19<tag>/.
set -u
cd "$(dirname "$0")/.."
run() {
  local tag="$1" params="$2"
  if [ -f /tmp/r4_yield ]; then
    echo "=== yield flag set, skipping rung $tag (re-run later) ==="
    return
  fi
  if [ -f "result/proxy19${tag}/head_to_head_summary.json" ]; then
    echo "=== rung $tag already done, skipping ==="
    return
  fi
  echo "=== rung $tag ($(date +%H:%M:%S)) params=$params ==="
  # 5400s: the first i_shape attempt hit a 3600s wall at ~60 min under
  # host CPU contention (corpus gen + test suite sharing the single core)
  timeout 5400 python -u scripts/proxy_head_to_head.py 100 2048 tpu 19 \
    "$params" "$tag" || echo "rung $tag exited rc=$?"
}
# pulse shaping + timing jitter only (no CFO/clock/fading): pure RRC ISI
run i_shape '{"cfo_max": 0, "clock_ppm_max": 0, "fading": false}'
# full chain minus selective fading
run i_nofade '{"fading": false}'
# full chain minus carrier frequency offset — REDUNDANT with the
# {iid, shaping-only, nofade, full} ladder (each ingredient's effect is a
# difference of adjacent rungs); re-enable only if the nofade rung leaves
# the CFO share ambiguous and the chip has slack.
if [ "${RUN_NOCFO:-0}" = "1" ]; then
  run i_nocfo '{"cfo_max": 0}'
fi
echo "ABLATION DONE"
