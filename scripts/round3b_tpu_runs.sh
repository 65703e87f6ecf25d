#!/bin/bash
# Round-3b TPU measurement campaign: the kernels landed at the end of the
# round-3 build (train-xpack, xpack-kt, whole-stack FUSECLS) plus the two
# remaining xpack micro-probes (G=5/6). Sequential — ONE chip. Each run is
# timeout-bounded (relay wedge mitigation: a hung run dies and the campaign
# continues; rerun any TIMEOUT row by hand).
# Detach with:  bash scripts/round3b_tpu_runs.sh > /tmp/round3b.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/7] train-xpack on-chip correctness (grad parity + dropout) ==="
VITIQ_TRAIN_ATTN=xpack timeout 2400 python -u scripts/tpu_check_train.py 16 \
    > /tmp/r3b_train_xpack_check.log 2>&1
echo "rc=$?"; tail -n 4 /tmp/r3b_train_xpack_check.log

echo "=== [2/7] train-xpack A/B: full step @ 2048 (baseline 156 ms) ==="
VITIQ_TRAIN_ATTN=xpack timeout 2400 python -u scripts/tpu_train_probe.py step 2048 8 \
    > /tmp/r3b_train_xpack_step.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3b_train_xpack_step.log

echo "=== [3/7] conv1d auto->kt correctness ==="
timeout 2400 python -u scripts/tpu_check_fused.py conv1d 64 \
    > /tmp/r3b_kt_check.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3b_kt_check.log

echo "=== [4/7] conv1d bench through kt (baseline 4.5K frames/s @ 2048) ==="
timeout 2400 python -u -m vitiq.cli bench --which conv1d_infer --batch_size 2048 \
    > /tmp/r3b_kt_bench.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3b_kt_bench.log

echo "=== [5/7] whole-stack FUSECLS under xpack (baseline 66.7 ms @ 8192) ==="
VITIQ_V3_FUSECLS=1 timeout 2400 python -u scripts/tpu_time.py pallas 8192 8 \
    > /tmp/r3b_fusecls.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3b_fusecls.log

echo "=== [6/7] xpack G=5 (G=4 default 66.7 ms @ 8192) ==="
VITIQ_V3_G=5 timeout 2400 python -u scripts/tpu_time.py pallas 8192 8 \
    > /tmp/r3b_g5.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3b_g5.log

echo "=== [7/7] xpack G=6 ==="
VITIQ_V3_G=6 timeout 2400 python -u scripts/tpu_time.py pallas 8192 8 \
    > /tmp/r3b_g6.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3b_g6.log

echo "ROUND3B RUNS COMPLETE"
