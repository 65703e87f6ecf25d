#!/bin/bash
# Round-5 chip queue, part 3 (fresh-environment restart): the gitignored
# result/ tree (17 GB corpus + all mid-flight checkpoints) did not survive
# the round boundary, so the refscale pair restarts from scratch on the
# regenerated corpus. Deadline-driven: guarantees BOTH arms ship
# report.json + eval artifacts + the best-vs-best comparison within the
# remaining wall clock, then extends both legs in +15-epoch slices while
# time remains (each extension clears DONE and resumes from ckpt_latest;
# refscale_train_device.py re-primes schedulers and best-params).
# Touch /tmp/r5_yield3 to stop between stages.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
yielded() { [ -f /tmp/r5_yield3 ] && { echo "yield flag set, stopping"; return 0; } || return 1; }

# hard deadline (epoch seconds) after which no new stage starts
END_TS=${END_TS:?set END_TS}
left() { echo $(( END_TS - $(date +%s) )); }

# --- 0. wait for the corpus generator (host job) ------------------------
while [ ! -f result/refscale_corpus/stats.json ]; do
  if yielded; then exit 0; fi
  if [ "$(left)" -lt 600 ]; then echo "deadline before corpus ready"; exit 1; fi
  sleep 60
done
log "corpus ready"

run_leg() { # arm epochs budget_s
  rm -f "result/refscale_$1/DONE"
  timeout "$3" python -u scripts/refscale_train_device.py "$1" \
    result/refscale_corpus "$2" || echo "$1 leg rc=$? (resume-safe)"
}

# --- 1. guaranteed pair: caps sized so both legs + compare fit ----------
if yielded; then exit 0; fi
if [ ! -f result/refscale_vit/report.json ]; then
  log "refscale vit -> cap 42"
  run_leg vit 42 "$(( $(left) / 2 - 900 ))"
fi
if yielded; then exit 0; fi
if [ ! -f result/refscale_rawiq_best/report.json ]; then
  log "refscale rawiq_best -> cap 42"
  run_leg rawiq_best 42 "$(( $(left) - 1500 ))"
fi
rescue_leg() { # arm: a timeout-killed leg has checkpoints but no report —
  # finish with cap=done+1 (one epoch + eval) so artifacts always ship
  if [ ! -f "result/refscale_$1/report.json" ]; then
    done_ep=$(python -c "import json;print(json.load(open('result/refscale_$1/ckpt_latest.json'))['epoch']+2)" 2>/dev/null || echo "")
    if [ -n "$done_ep" ]; then
      log "rescue $1 -> cap $done_ep"
      run_leg "$1" "$done_ep" 2400
    fi
  fi
}
rescue_leg vit
rescue_leg rawiq_best
if yielded; then exit 0; fi
if [ -f result/refscale_vit/report.json ] \
   && [ -f result/refscale_rawiq_best/report.json ]; then
  log "refscale comparison"
  timeout 1500 python -u scripts/refscale_compare.py || echo "compare rc=$?"
fi

# --- 2. extend both legs in +15-epoch slices while time remains ---------
# (~95 s/epoch + eval pass; one slice for both arms + re-compare ~60 min)
cap=42
while [ "$(left)" -gt 4200 ]; do
  if yielded; then exit 0; fi
  cap=$(( cap + 15 ))
  log "extension slice -> cap $cap"
  es_vit=$(python -c "import json;print(int(json.load(open('result/refscale_vit/report.json'))['stopped_early']))" 2>/dev/null || echo 0)
  es_raw=$(python -c "import json;print(int(json.load(open('result/refscale_rawiq_best/report.json'))['stopped_early']))" 2>/dev/null || echo 0)
  [ "$es_vit" = 1 ] && [ "$es_raw" = 1 ] && { log "both arms early-stopped"; break; }
  [ "$es_vit" = 1 ] || run_leg vit "$cap" "$(( $(left) / 2 - 600 ))"
  if yielded; then exit 0; fi
  [ "$es_raw" = 1 ] || run_leg rawiq_best "$cap" "$(( $(left) - 1200 ))"
  timeout 1500 python -u scripts/refscale_compare.py || echo "compare rc=$?"
done

log "ROUND5 SEQUENCER3 DONE"
