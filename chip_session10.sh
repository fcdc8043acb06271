#!/bin/bash
# Tenth serial chip session (round 5, informed by session 9 + CPU screens):
#  - tracking >=8 fps attempt: pyramid coarse iters replace full-res ones
#    (session 9 showed 4 full + 3 coarse lands 4.5x TIGHTER than 6 flat at
#    equal cost), plus the winning frozen-binning margin 2;
#  - ATE: the CPU-screen winner (map-iters 40 / window 5: 5.77 -> 5.32 cm
#    at 96x128) at chip scale, and close-loop WITH relocalization (the
#    close-loop trajectory loses tracking at frame ~80, loss 183);
#  - bwd_chunk=64 retry with a 90-min timeout (twice timed out at 40 min);
#  - final default bench keeps the driver cache warm.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session10.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. tracking pyr2: 3 full + 2 coarse + frozen binning margin 2 (8fps arm)"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=2 DGR_TRACK_ITERS=3 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "2. tracking pyr2: 4 full + 3 coarse + frozen binning margin 2"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=3 DGR_TRACK_ITERS=4 DGR_TRACK_FREEZE=1 \
    DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "3. ATE 120 frames: map-iters 40, window 5 (CPU-screen winner)"
timeout 7200 python examples/bench_ate.py --frames 120 \
    --map-iters 40 --window 5 >> "$LOG" 2>&1

note "4. ATE 120 frames: close-loop + reloc-spike 1.3"
timeout 7200 python examples/bench_ate.py --frames 120 --close-loop \
    --reloc-spike 1.3 >> "$LOG" 2>&1

note "5. bench.py bwd A/B retry: DGR_BWD_CHUNK=64 (90-min budget)"
DGR_BWD_CHUNK=64 timeout 5400 python bench.py >> "$LOG" 2>&1

note "6. bench.py defaults (driver cache insurance)"
timeout 2400 python bench.py >> "$LOG" 2>&1

note "done"
