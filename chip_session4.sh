#!/bin/bash
# Fourth serial chip session: push the 120-frame procedural ATE below 5 cm.
# Session-3 stage 1 measured 6.52 cm with nearest-window selection (the
# coverage trigger never fired at 0.8 — keyframes stayed at the periodic
# 40); the remaining drift tracks map quality in newly-entered territory,
# so this session raises the mapping effort + refinement cadence, then
# validates the best config on the 250-frame closed loop.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session4.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. ATE 120 frames: map-iters 30, window 6, refine-every 2"
timeout 5400 python examples/bench_ate.py --frames 120 \
    --map-iters 30 --window 6 --refine-every 2 >> "$LOG" 2>&1

note "2. ATE 250 frames, closed loop, same config"
timeout 7200 python examples/bench_ate.py --frames 250 --close-loop \
    --map-iters 30 --window 6 --refine-every 2 >> "$LOG" 2>&1

note "3. re-warm driver bench cache"
timeout 590 python bench.py >> "$LOG" 2>&1

note "done"
