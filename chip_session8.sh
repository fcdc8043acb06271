#!/bin/bash
# Eighth serial chip session: session 7's ATE stage restarted with a
# timeout sized for COLD relay compiles (session 7 spent 28 min in
# compile without reaching frame 1; its finished graphs are in
# .jax_cache, so this run resumes warm where it got to).  Then the
# pending bin_row_gather bench A/B.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session8.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. ATE 120 frames: defaults (= 4.52 cm record config) + window 6, kf-every 2"
timeout 7200 python examples/bench_ate.py --frames 120 \
    --window 6 --kf-every 2 >> "$LOG" 2>&1

note "2. bench.py DGR_BIN_ROW_GATHER=1 (A/B arm)"
DGR_BIN_ROW_GATHER=1 timeout 1200 python bench.py >> "$LOG" 2>&1

note "done"
