#!/bin/bash
# Seventh serial chip session (round 4 continuation).  Fresh environment:
# .jax_cache is empty, so stage 1 both re-warms the committed-default
# bench graph (what the driver will run at round end) and re-probes the
# instance count.  Stage 2 is the queued ATE campaign arm (lr-decay map
# schedule at denser keyframes + wider windows; target <=3 cm).  Stage 3
# is the pending bin_row_gather A/B arm (1-col marks-scan + row gather
# vs 12-col delta-scan expansion; 1.7x cheaper in the standalone
# microbench) — adoption decided from the log afterwards.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session7.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. bench.py committed defaults (cold: probe + compile + measure)"
timeout 1500 python bench.py >> "$LOG" 2>&1

note "2. ATE 120 frames: defaults (= 4.52 cm record config) + window 6, kf-every 2"
timeout 2700 python examples/bench_ate.py --frames 120 \
    --window 6 --kf-every 2 >> "$LOG" 2>&1

note "3. bench.py DGR_BIN_ROW_GATHER=1 (A/B arm)"
DGR_BIN_ROW_GATHER=1 timeout 1200 python bench.py >> "$LOG" 2>&1

note "done"
