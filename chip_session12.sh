#!/bin/bash
# Twelfth serial chip session (round 5, final): re-run the ATE record
# defaults so the record row carries the new SE(3)-aligned ATE
# (ate_aligned_cm, evo/TUM convention — what the CG-SLAM-class numbers
# in the reference README are evaluated with), then final driver cache
# insurance for bench.py and the tracking bench.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session12.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. ATE 120 frames: record defaults (reports ate_aligned_cm)"
timeout 9000 python examples/bench_ate.py --frames 120 >> "$LOG" 2>&1

note "2. tracking pyr2: 2 full + 3 coarse + frozen margin 2 (8fps at tight err?)"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=3 DGR_TRACK_ITERS=2 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "3. bench.py defaults (driver cache insurance)"
timeout 2400 python bench.py >> "$LOG" 2>&1

note "4. tracking defaults (record config warm-cache insurance)"
timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "done"
