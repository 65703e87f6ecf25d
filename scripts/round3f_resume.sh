#!/bin/bash
# Resume of round3f_tpu_runs.sh from item 3 (items 1-2 completed before the
# prior session ended: streaming 135.7K, lat256 p50 5.52 ms).
set -x
cd "$(dirname "$0")/.."

echo "=== [3/8] p50 latency @ 1024 (round-2: 12.7 ms) ==="
timeout 2400 python -u -m vitiq.cli bench --which fused_vit_infer --batch_size 1024 \
    > /tmp/r3f_lat1024.log 2>&1
echo "rc=$?"; tail -n 2 /tmp/r3f_lat1024.log

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
