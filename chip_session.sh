#!/bin/bash
# Serial chip-measurement session (run when the axon relay is reachable).
# NEVER run two chip jobs concurrently — overlapping executions wedge the
# relay for ~20 min.  Logs to chip_session.log; each stage under timeout.
set -u
cd /root/repo
LOG=chip_session.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay still down; aborting"; exit 1; }

note "1. bench.py (cold -> warms the cache; may compile for minutes)"
timeout 1800 python bench.py >> "$LOG" 2>&1
note "2. bench.py (warm -> the number of record)"
timeout 590 python bench.py >> "$LOG" 2>&1

note "3. A/B: MXU scans (scan_sum_mm / scan_prod_mm)"
timeout 1800 python prof_ab.py scan_sum_mm=1 scan_prod_mm=1 >> "$LOG" 2>&1
timeout 1200 python prof_ab.py scan_sum_mm=1 >> "$LOG" 2>&1
timeout 1200 python prof_ab.py scan_prod_mm=1 >> "$LOG" 2>&1

note "4. dual-render (pose-jvp) cost ratio"
timeout 1800 python prof_jvp.py >> "$LOG" 2>&1

note "5. tracking bench: exact GN (default) then gn_fd for comparison"
timeout 1800 python bench_tracking.py >> "$LOG" 2>&1
DGR_TRACK_METHOD=gn_fd timeout 1200 python bench_tracking.py >> "$LOG" 2>&1

note "6. occlusion-heavy scene A/B (early termination payoff)"
DGR_SCENE=room timeout 1200 python prof_ab.py chunk=128 >> "$LOG" 2>&1

note "7. mapping bench"
timeout 1200 python bench_mapping.py >> "$LOG" 2>&1

note "8a. ATE benchmark, bounded run (warms every SLAM-loop compile)"
timeout 2400 python examples/bench_ate.py --frames 30 >> "$LOG" 2>&1
note "8b. ATE benchmark, full 120-frame sequence (warm cache)"
timeout 3600 python examples/bench_ate.py >> "$LOG" 2>&1

note "done"
