#!/bin/bash
# Follow-up serial chip session (run ONLY after chip_session.sh finishes):
# adopts the measured MXU-scan win as the bench default, profiles the new
# config, A/Bs the remaining single-chip levers, and re-warms the cache so
# the driver's end-of-round bench.py run is seconds.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session2.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. bench.py with MXU-scan defaults (cold -> warms driver cache)"
timeout 1800 python bench.py >> "$LOG" 2>&1
note "2. bench.py warm (number of record)"
timeout 590 python bench.py >> "$LOG" 2>&1

note "3. per-op trace of the new config"
timeout 1200 python prof_trace.py /tmp/jaxtrace_r3 >> "$LOG" 2>&1

note "4. A/B: splat_basis_power on top of scan flags"
timeout 1500 python prof_ab.py splat_basis_power=1 >> "$LOG" 2>&1

note "5. A/B: kernel_tile_batch (grid-step amortization) on new baseline"
timeout 1500 python prof_ab.py kernel_tile_batch=4 >> "$LOG" 2>&1

note "done"
