#!/bin/bash
# Round-5 chip queue, part 4 (opportunistic, after sequencer3): VERDICT
# item 3 — PSO fitness calibration, then sweep iterations while time
# remains (the sweep artifact persists per iteration and resumes).
# Touch /tmp/r5_yield4 to stop between stages.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
yielded() { [ -f /tmp/r5_yield4 ] && { echo "yield flag set, stopping"; return 0; } || return 1; }
END_TS=${END_TS:?set END_TS}
left() { echo $(( END_TS - $(date +%s) )); }

if yielded; then exit 0; fi
if [ ! -f docs/pso_fitness_calibration.json ] && [ "$(left)" -gt 2400 ]; then
  log "pso fitness calibration"
  timeout "$(( $(left) - 600 ))" python -u scripts/pso_calibrate.py 400 3 \
    || echo "calibrate rc=$?"
fi

if yielded; then exit 0; fi
if [ "$(left)" -gt 1800 ]; then
  log "pso sweep (resumable artifact, bounded by deadline)"
  timeout "$(( $(left) - 300 ))" python -u scripts/pso_full_sweep.py 25 \
    || echo "sweep rc=$?"
fi
log "ROUND5 SEQUENCER4 DONE"
