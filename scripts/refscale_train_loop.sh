#!/bin/bash
# Restart loop for scripts/refscale_train.py (relay pins H2D bytes per
# process — see the driver's docstring). Each iteration is a fresh process
# that RESUMES from ckpt_latest, runs epochs_per_proc epochs, exits.
# Usage: bash scripts/refscale_train_loop.sh {vit,rawiq_best} [corpus] [epp] [total]
set -u
ARM="${1:-rawiq_best}"
CORPUS="${2:-result/refscale_corpus}"
EPP="${3:-8}"
TOTAL="${4:-60}"
OUT="result/refscale_${ARM}"
for i in $(seq 1 40); do
  if [ -f "$OUT/DONE" ]; then echo "DONE after $((i-1)) procs"; exit 0; fi
  echo "=== proc $i ($(date +%H:%M:%S)) ==="
  timeout 5400 python -u scripts/refscale_train.py "$ARM" "$CORPUS" "$EPP" "$TOTAL" || {
    echo "proc $i exited nonzero (rc=$?) — retrying from checkpoint"; sleep 5; }
done
echo "loop budget exhausted"
