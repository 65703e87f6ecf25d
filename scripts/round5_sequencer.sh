#!/bin/bash
# Round-5 chip sequencer (VERDICT r4 items 2 + 4): finish the refscale pair
# to the reference regime (100-epoch cap, patience 10), build the at-scale
# best-vs-best comparison, then complete the impairment-ablation ladder
# (the no-fading rung + a 2x-budget full-chain rung for the corpus-size
# question). Each stage is skipped if its artifact already exists, so the
# sequencer is re-runnable after interruptions. Touch /tmp/r5_yield to make
# it stop between stages (it never kills a running stage).
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
yielded() { [ -f /tmp/r5_yield ] && { echo "yield flag set, stopping"; return 0; } || return 1; }

# --- 1. refscale ViT to convergence (was restart-capped at 25 epochs) ----
if yielded; then exit 0; fi
if python -c "import json,sys; r=json.load(open('result/refscale_vit/report.json')); sys.exit(0 if (r['stopped_early'] or r['epochs']>=100) else 1)" 2>/dev/null; then
  log "refscale vit already converged, skipping"
else
  log "refscale vit -> 100-epoch regime"
  rm -f result/refscale_vit/DONE
  timeout 13000 python -u scripts/refscale_train_device.py vit result/refscale_corpus 100 \
    || echo "vit leg exited rc=$? (resume-safe)"
fi

# --- 2. refscale rawiq_best to convergence ------------------------------
if yielded; then exit 0; fi
if python -c "import json,sys; r=json.load(open('result/refscale_rawiq_best/report.json')); sys.exit(0 if (r['stopped_early'] or r['epochs']>=100) else 1)" 2>/dev/null; then
  log "refscale rawiq_best already converged, skipping"
else
  log "refscale rawiq_best -> 100-epoch regime"
  rm -f result/refscale_rawiq_best/DONE
  timeout 13000 python -u scripts/refscale_train_device.py rawiq_best result/refscale_corpus 100 \
    || echo "rawiq leg exited rc=$? (resume-safe)"
fi

# --- 3. best-vs-best comparison at scale --------------------------------
if yielded; then exit 0; fi
if [ -f result/refscale_vit/report.json ] && [ -f result/refscale_rawiq_best/report.json ]; then
  log "refscale comparison"
  timeout 1800 python -u scripts/refscale_compare.py || echo "compare rc=$?"
fi

# --- 4. ablation: the missing no-fading rung (resumes vit from ep 80) ---
if yielded; then exit 0; fi
if [ -f result/proxy19i_nofade/head_to_head_summary.json ]; then
  log "nofade rung already done, skipping"
else
  log "ablation rung i_nofade"
  timeout 7200 python -u scripts/proxy_head_to_head.py 100 2048 tpu 19 \
    '{"fading": false}' i_nofade || echo "nofade rung rc=$?"
fi

# --- 5. ablation: full chain at 2x frames/class (corpus-size question) --
if yielded; then exit 0; fi
if [ -f result/proxy19i4k/head_to_head_summary.json ]; then
  log "i4k rung already done, skipping"
else
  log "ablation rung i4k (full chain @ 4096 frames/class)"
  timeout 10800 python -u scripts/proxy_head_to_head.py 100 4096 tpu 19 \
    imp i4k || echo "i4k rung rc=$?"
fi

if yielded; then exit 0; fi
timeout 600 python -u scripts/ablation_table.py || echo "table rc=$?"
log "ROUND5 SEQUENCER DONE"
