#!/bin/bash
# Round-3ap: attribute vit_tiny's 16.7 ms train-step glue (59% of its
# 28.09 ms step @ 8192 — the largest remaining train lever) and seg-64
# mp's 6.1 ms. All probes are PER-CALL from one session — totals carry
# the ~25 ms relay RTT tax; only DELTAS between rows are meaningful
# (docs/BENCHMARKS.md rounds 3u-3w).
set -u
cd "$(dirname "$0")/.."
probe() { # variant batch arm
  timeout 2400 python -u scripts/tpu_train_probe.py "$1" "$2" 10 - "$3"
}
for v in step fwdgrad fwdtrain preembed preonly sgdstep noclip; do
  echo "--- vit_tiny $v @ 8192 ---"
  probe "$v" 8192 vit_tiny 2>&1 | tee /tmp/r3ap_tiny_$v.log
done
for v in step fwdgrad preembed preonly sgdstep; do
  echo "--- rawiq_seg64_mp $v @ 8192 ---"
  probe "$v" 8192 rawiq_seg64_mp 2>&1 | tee /tmp/r3ap_seg64_$v.log
done
echo "ROUND3AP QUEUE COMPLETE"
