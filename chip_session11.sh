#!/bin/bash
# Eleventh serial chip session (round 5): the offline-polish ATE arm
# (final re-track of every frame against the finished map), a pyramid-3
# tracking-robustness ATE arm, the 8-fps tracking attempt #2, and the
# final default bench for driver cache insurance.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session11.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. ATE 120 frames: record defaults + --final-retrack 8 (offline polish)"
timeout 9000 python examples/bench_ate.py --frames 120 --final-retrack 8 \
    >> "$LOG" 2>&1

note "2. tracking pyr2: 2 full + 2 coarse + frozen binning margin 2 (8fps #2)"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=2 DGR_TRACK_ITERS=2 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "3. ATE 120 frames: pyramid 3, coarse-iters 5, track-iters 8"
timeout 7200 python examples/bench_ate.py --frames 120 --pyramid 3 \
    --coarse-iters 5 --track-iters 8 >> "$LOG" 2>&1

note "4. bench.py defaults (driver cache insurance)"
timeout 2400 python bench.py >> "$LOG" 2>&1

note "done"
