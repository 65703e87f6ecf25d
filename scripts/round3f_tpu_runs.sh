#!/bin/bash
# Round-3f TPU campaign: (a) refresh the BASELINE-metric rows that ride
# the new auto-xpack defaults (streaming config 5, small-batch p50
# latency), (b) attribute the conv1d wall with kernel-surgery probes
# (kt removed its serialization and was NEUTRAL, so the wall is NOT the
# per-head chains — measure what it is).
# Detach with:  bash scripts/round3f_tpu_runs.sh > /tmp/round3f.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/8] streaming wideband (BASELINE config 5; round-2: 108.1K) ==="
timeout 2400 python -u -m vitiq.cli bench --which streaming > /tmp/r3f_streaming.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_streaming.log

echo "=== [2/8] p50 latency @ 256 (round-2: 5.9 ms) ==="
timeout 2400 python -u -m vitiq.cli bench --which fused_vit_infer --batch_size 256 \
    > /tmp/r3f_lat256.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_lat256.log

echo "=== [3/8] p50 latency @ 1024 (round-2: 12.7 ms) ==="
timeout 2400 python -u -m vitiq.cli bench --which fused_vit_infer --batch_size 1024 \
    > /tmp/r3f_lat1024.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_lat1024.log

# conv1d attribution: 6 fused layers at 1025 tokens, batch small enough
# to iterate (512), chained core (xpack G=0 there). Surgery probes are
# TIMING-ONLY (wrong outputs).
echo "=== [4/8] conv1d layersL baseline ==="
timeout 2400 python -u scripts/tpu_time.py layersL 512 4 > /tmp/r3f_convL_base.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_convL_base.log

echo "=== [5/8] conv1d layersL noattn ==="
VITIQ_V3_PROBE=noattn timeout 2400 python -u scripts/tpu_time.py layersL 512 4 \
    > /tmp/r3f_convL_noattn.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_convL_noattn.log

echo "=== [6/8] conv1d layersL noscore ==="
VITIQ_V3_PROBE=noscore timeout 2400 python -u scripts/tpu_time.py layersL 512 4 \
    > /tmp/r3f_convL_noscore.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_convL_noscore.log

echo "=== [7/8] conv1d layersL noexp ==="
VITIQ_V3_PROBE=noexp timeout 2400 python -u scripts/tpu_time.py layersL 512 4 \
    > /tmp/r3f_convL_noexp.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_convL_noexp.log

echo "=== [8/8] conv1d layersL nopv ==="
VITIQ_V3_PROBE=nopv timeout 2400 python -u scripts/tpu_time.py layersL 512 4 \
    > /tmp/r3f_convL_nopv.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_convL_nopv.log

echo "ROUND3F RUNS COMPLETE"
