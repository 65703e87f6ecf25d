#!/bin/bash
# Round-4 TPU sequencer (after the ablation ladder):
#   1. launch the full-regime PSO sweep (VERDICT r3 item 5) — partial trace
#      persists every iteration, so a preempt still leaves the artifact;
#   2. when the refscale corpus finishes (stats.json written), preempt the
#      sweep (SIGTERM) and run the reference-scale streaming train runs
#      (VERDICT r3 item 2): rawiq_best first, then the ViT flagship.
set -u
cd "$(dirname "$0")/.."
CORPUS=result/refscale_corpus

echo "=== sequencer: launching PSO full sweep ($(date +%H:%M:%S)) ==="
timeout 14400 python -u scripts/pso_full_sweep.py 25 docs/pso_full_sweep.json \
  > /tmp/pso_full.log 2>&1 &
PSO=$!
echo "$PSO" > /tmp/pso.pid

while true; do
  if [ -f "$CORPUS/stats.json" ]; then
    if kill -0 "$PSO" 2>/dev/null; then
      echo "=== corpus ready: preempting PSO (pid $PSO, $(date +%H:%M:%S)) ==="
      kill "$PSO" 2>/dev/null
      sleep 10
    fi
    break
  fi
  if ! kill -0 "$PSO" 2>/dev/null; then
    echo "=== PSO finished before corpus ready ($(date +%H:%M:%S)); waiting for corpus ==="
    while [ ! -f "$CORPUS/stats.json" ]; do sleep 60; done
    break
  fi
  sleep 60
done

echo "=== refscale rawiq_best ($(date +%H:%M:%S)) ==="
bash scripts/refscale_train_loop.sh rawiq_best "$CORPUS" 8 60 \
  > /tmp/refscale_rawiq_best.log 2>&1
echo "=== refscale vit ($(date +%H:%M:%S)) ==="
bash scripts/refscale_train_loop.sh vit "$CORPUS" 8 60 \
  > /tmp/refscale_vit.log 2>&1
echo "=== sequencer done ($(date +%H:%M:%S)) ==="
