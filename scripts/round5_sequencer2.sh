#!/bin/bash
# Round-5 chip queue, part 2 (after the refscale legs + comparison):
# the remaining VERDICT items in priority order — streaming-tier
# superbatch measurement (item 6 done-criterion), the no-fading ablation
# rung (item 4), PSO fitness calibration then the sweep (item 3, resumable
# artifact), and the 2x-budget ablation rung last (item 4 extra).
# Re-runnable: each stage skips if its artifact exists. Touch /tmp/r5_yield2
# to stop between stages.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
yielded() { [ -f /tmp/r5_yield2 ] && { echo "yield flag set, stopping"; return 0; } || return 1; }

# --- 1. streaming tier with device-scan superbatching (2 epochs) --------
if yielded; then exit 0; fi
if [ -f docs/STREAM_SCAN_EPOCH.json ]; then
  log "streaming scan measurement already done, skipping"
else
  log "streaming tier @ device_scan_steps=128 (2 epochs, scratch dir)"
  rm -rf /tmp/streamprobe && mkdir -p /tmp/streamprobe/result
  ln -s /root/repo/result/refscale_corpus /tmp/streamprobe/result/refscale_corpus
  (cd /tmp/streamprobe && timeout 3600 python -u /root/repo/scripts/refscale_train.py \
     vit result/refscale_corpus 2 2) || echo "stream probe rc=$?"
  python - <<'PYEOF'
import json, pathlib
p = pathlib.Path("/tmp/streamprobe/result/refscale_vit/ckpt_latest.json")
if p.exists():
    h = json.loads(p.read_text())["history"]
    out = {"tier": "streaming out-of-core, device_scan_steps=128",
           "epoch_times_s": h["epoch_time"],
           "device_tier_epoch_s": 93.0,
           "r4_streaming_epoch_s": 678.0}
    pathlib.Path("docs/STREAM_SCAN_EPOCH.json").write_text(
        json.dumps(out, indent=2))
    print(out)
else:
    print("stream probe produced no checkpoint")
PYEOF
fi

# --- 2. ablation: the missing no-fading rung ----------------------------
if yielded; then exit 0; fi
if [ -f result/proxy19i_nofade/head_to_head_summary.json ]; then
  log "nofade rung already done, skipping"
else
  log "ablation rung i_nofade (vit resumes from ep 80)"
  timeout 7200 python -u scripts/proxy_head_to_head.py 100 2048 tpu 19 \
    '{"fading": false}' i_nofade || echo "nofade rung rc=$?"
  timeout 600 python -u scripts/ablation_table.py || echo "table rc=$?"
fi

# --- 3. PSO fitness calibration ----------------------------------------
if yielded; then exit 0; fi
if [ -f docs/pso_fitness_calibration.json ]; then
  log "pso calibration already done, skipping"
else
  log "pso fitness calibration (5 archs x 3 seeds @ 400 scanned steps)"
  timeout 7200 python -u scripts/pso_calibrate.py 400 3 || echo "calibrate rc=$?"
fi

# --- 4. PSO sweep (resumable; every iteration persists) -----------------
if yielded; then exit 0; fi
if python -c "import json,sys; d=json.load(open('docs/pso_full_sweep.json')); sys.exit(0 if not d.get('partial') and d.get('train_steps')==400 else 1)" 2>/dev/null; then
  log "pso sweep already complete at the calibrated budget, skipping"
else
  log "pso full sweep 18x25 @ 400 scanned steps (resumes its own artifact)"
  timeout 14000 python -u scripts/pso_full_sweep.py 25 || echo "sweep rc=$?"
fi

# --- 5. ablation: full chain at 2x frames/class -------------------------
if yielded; then exit 0; fi
if [ -f result/proxy19i4k/head_to_head_summary.json ]; then
  log "i4k rung already done, skipping"
else
  log "ablation rung i4k (full chain @ 4096 frames/class)"
  timeout 10800 python -u scripts/proxy_head_to_head.py 100 4096 tpu 19 \
    imp i4k || echo "i4k rung rc=$?"
  timeout 600 python -u scripts/ablation_table.py || echo "table rc=$?"
fi

log "ROUND5 SEQUENCER2 DONE"
