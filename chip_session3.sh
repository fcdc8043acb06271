#!/bin/bash
# Third serial chip session: measure the round-3 drift fixes on the
# procedural ATE benchmark (coverage-triggered keyframing + overlap-based
# mapping windows).  The 8.45 cm / 120-frame baseline from chip_session.log
# stage 8b stands (same seed + procedure; --kf-coverage 0
# --window-select random reproduces it bit-for-bit), so only the new
# configs run here.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session3.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. ATE 120 frames, drift fixes at defaults (kf-coverage 0.8, nearest)"
timeout 3600 python examples/bench_ate.py --frames 120 >> "$LOG" 2>&1

note "2. ATE 120 frames, + deeper coverage-triggered mapping rounds"
timeout 3600 python examples/bench_ate.py --frames 120 \
    --coverage-map-iters 30 >> "$LOG" 2>&1

note "3. ATE 250 frames, closed loop (re-observes the earliest map)"
timeout 5400 python examples/bench_ate.py --frames 250 --close-loop \
    >> "$LOG" 2>&1

note "4. re-warm driver bench cache"
timeout 590 python bench.py >> "$LOG" 2>&1

note "done"
