#!/bin/bash
# Ninth serial chip session (round 5): backward-kernel A/B campaign,
# tracking arms (freeze margins 2/4, pyramid), ATE close-loop / reloc
# arms, and a final default bench to leave the driver's cache warm.
# Timeouts sized for COLD relay compiles (session 7/8 saw 12-28 min).
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session9.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. bench.py defaults (warm-up + round-5 baseline number)"
timeout 2400 python bench.py >> "$LOG" 2>&1

note "2. bench.py bwd A/B: VPU cumsum in bwd (DGR_BWD_SCAN_SUM_MM=0)"
DGR_BWD_SCAN_SUM_MM=0 timeout 2400 python bench.py >> "$LOG" 2>&1

note "3. bench.py bwd A/B: VPU cumprod in bwd (DGR_BWD_SCAN_PROD_MM=0)"
DGR_BWD_SCAN_PROD_MM=0 timeout 2400 python bench.py >> "$LOG" 2>&1

note "4. bench.py bwd A/B: both bwd scans on VPU"
DGR_BWD_SCAN_SUM_MM=0 DGR_BWD_SCAN_PROD_MM=0 timeout 2400 python bench.py \
    >> "$LOG" 2>&1

note "5. bench.py bwd A/B: bwd sub-chunk 64 (DGR_BWD_CHUNK=64)"
DGR_BWD_CHUNK=64 timeout 2400 python bench.py >> "$LOG" 2>&1

note "6. tracking defaults (deferred-accept GN = record config)"
timeout 3600 python bench_tracking.py >> "$LOG" 2>&1

note "7. tracking frozen binning, margin 2 px"
DGR_TRACK_FREEZE=1 DGR_TRACK_MARGIN=2 timeout 3600 python bench_tracking.py \
    >> "$LOG" 2>&1

note "8. tracking frozen binning, margin 4 px"
DGR_TRACK_FREEZE=1 DGR_TRACK_MARGIN=4 timeout 3600 python bench_tracking.py \
    >> "$LOG" 2>&1

note "9. tracking pyramid 2 (4 full-res + 3 coarse iters)"
DGR_TRACK_PYR=2 DGR_TRACK_COARSE=3 DGR_TRACK_ITERS=4 timeout 3600 \
    python bench_tracking.py >> "$LOG" 2>&1

note "10. ATE 120 frames: record defaults + --close-loop (unmeasured arm)"
timeout 7200 python examples/bench_ate.py --frames 120 --close-loop \
    >> "$LOG" 2>&1

note "11. ATE 120 frames: record defaults + reloc-spike 1.3"
timeout 7200 python examples/bench_ate.py --frames 120 --reloc-spike 1.3 \
    >> "$LOG" 2>&1

note "12. bench.py defaults again (driver cache insurance: warm compile)"
timeout 2400 python bench.py >> "$LOG" 2>&1

note "done"
