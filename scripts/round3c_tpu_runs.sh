#!/bin/bash
# Round-3c TPU campaign: (a) bisect the seg-64 (Lp=32) xpack compile stall
# (round-3 left it "unresolved past the 10-min AOT window" — hypothesis:
# the VMEM picker chooses a huge G at tiny Lp, exploding the unrolled
# scatter/epilogue program), (b) head-variant rows through xpack (H2 was
# only ever measured on the chained core), (c) post-default-flip headline.
# Sequential — ONE chip. Each run timeout-bounded (relay-wedge mitigation).
# Detach with:  bash scripts/round3c_tpu_runs.sh > /tmp/round3c.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/6] seg-64 xpack, G forced 4 (1-layer would need code; full stack) ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_G=4 timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq64_infer --batch_size 8192 > /tmp/r3c_l32_g4.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_l32_g4.log

echo "=== [2/6] seg-64 xpack, G forced 16 ==="
VITIQ_V3_ATTN=xpack VITIQ_V3_G=16 timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq64_infer --batch_size 8192 > /tmp/r3c_l32_g16.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_l32_g16.log

echo "=== [3/6] seg-64 xpack, picker's own G (the round-3 stall repro) ==="
VITIQ_V3_ATTN=xpack timeout 1500 python -u -m vitiq.cli bench \
    --which rawiq64_infer --batch_size 8192 > /tmp/r3c_l32_auto.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_l32_auto.log

echo "=== [4/6] H4 through xpack @ 8192 (chained H4: 154K; xpack H4 round-3: 158K recheck) ==="
timeout 2400 python -u -m vitiq.cli bench --which head_variant --n_head 4 \
    --batch_size 8192 > /tmp/r3c_h4.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_h4.log

echo "=== [5/6] H2 through xpack @ 8192 (chained H2: 189K) ==="
timeout 2400 python -u -m vitiq.cli bench --which head_variant --n_head 2 \
    --batch_size 8192 > /tmp/r3c_h2.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_h2.log

echo "=== [5b/6] on-chip parity at the new G=7 default ==="
timeout 2400 python -u scripts/tpu_check_fused.py vit 64 > /tmp/r3c_parity_g7.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_parity_g7.log

echo "=== [6/6] headline bench at driver default (post default flips) ==="
timeout 3000 python -u bench.py > /tmp/r3c_headline.log 2>&1
echo "rc=$?"; tail -n 3 /tmp/r3c_headline.log

echo "ROUND3C RUNS COMPLETE"
