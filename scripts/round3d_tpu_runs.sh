#!/bin/bash
# Round-3d TPU campaign: small-Lp xpack exploitation. Round 3c showed the
# old seg-64 "compile stall" does not reproduce and xpack at Lp=32 is a
# G-hungry WIN (G=4 324.9K < chained 372.9K < G=16 541.8K frames/s):
# probe the ladder upward, certify parity, and try the Lp=80 seg-16 arm
# with pack disabled (xpack requires pack==1; chained+pack2 = 165-175K).
# Detach with:  bash scripts/round3d_tpu_runs.sh > /tmp/round3d.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/5] seg-64 xpack G=24 ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_G=24 timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq64_infer --batch_size 8192 > /tmp/r3d_l32_g24.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3d_l32_g24.log

echo "=== [2/5] seg-64 xpack G=32 ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_G=32 timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq64_infer --batch_size 8192 > /tmp/r3d_l32_g32.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3d_l32_g32.log

echo "=== [3/5] seg-64 xpack parity on chip (G=16 known-good config) ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_G=16 timeout 2400 python -u scripts/tpu_check_fused.py seg64 64 \
    > /tmp/r3d_seg64_parity.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3d_seg64_parity.log

echo "=== [4/5] seg-16 rawIQ arm: xpack with pack disabled (Lp=80) ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_PACK=0 timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq_infer --batch_size 8192 > /tmp/r3d_l80_xpack.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3d_l80_xpack.log

echo "=== [5/5] seg-16 rawIQ arm: xpack pack-off G=16 ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_PACK=0 VITIQ_V3_G=16 timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq_infer --batch_size 8192 > /tmp/r3d_l80_xpack_g16.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3d_l80_xpack_g16.log

echo "ROUND3D RUNS COMPLETE"
