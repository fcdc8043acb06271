#!/bin/bash
# Thirteenth serial chip session (round 5): push the accuracy-matched
# tracking record past 8 fps.  Session-12 found 2 full + 3 coarse beats
# the 3+2 record on BOTH axes (7.87 fps at 1.8e-5 vs 7.07 at 3.5e-5);
# these arms continue the trade-full-for-coarse direction.  Warm-shape
# arms first; the pyramid-3 arm last (new 300x170 kernel shapes compile
# cold through the relay).
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session13.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. tracking pyr2: 1 full + 4 coarse + frozen margin 2"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=4 DGR_TRACK_ITERS=1 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "2. tracking pyr2: 1 full + 5 coarse + frozen margin 2"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=5 DGR_TRACK_ITERS=1 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "3. tracking pyr2: 2 full + 3 coarse + frozen margin 1"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=3 DGR_TRACK_ITERS=2 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=1 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "4. tracking pyr3: 2 full + 2 coarse/level + frozen margin 2 (cold compile)"
DGR_TRACK_PYR=3 DGR_TRACK_COARSE=2 DGR_TRACK_ITERS=2 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "done"
