#!/bin/bash
# Round-4 sequencer, phase 2: device-resident refscale runs (resuming the
# streaming tier's checkpoints), then the PSO sweep with whatever chip
# time remains. Each refscale invocation is restartable (ckpt resume), so
# the retry loop doubles as the at-scale rescue proof.
set -u
cd "$(dirname "$0")/.."
CORPUS=result/refscale_corpus

for arm in rawiq_best vit; do
  echo "=== device refscale $arm ($(date +%H:%M:%S)) ==="
  for i in 1 2 3 4; do
    [ -f "result/refscale_${arm}/DONE" ] && break
    timeout 10800 python -u scripts/refscale_train_device.py "$arm" "$CORPUS" 60 \
      >> "/tmp/refscale_${arm}_dev.log" 2>&1 || {
      echo "proc $i exited rc=$? — retrying from checkpoint"; sleep 5; }
  done
done

echo "=== PSO resume ($(date +%H:%M:%S)) ==="
timeout 14400 python -u scripts/pso_full_sweep.py 25 docs/pso_full_sweep.json \
  > /tmp/pso_full2.log 2>&1
echo "=== sequencer2 done ($(date +%H:%M:%S)) ==="
