#!/bin/bash
# Sixth serial chip session (final round-3 ATE experiment).  Sessions 4-5
# showed heavier MAPPING diverges (32.9 cm / 453 cm); the proven best is
# the default mapping effort with nearest windows (6.52 cm).  This run
# keeps that config and adds the three safe levers: the refinement cost
# gate (drops immature-map absolute edges), a tighter refinement cadence
# (safe only WITH the gate), and two extra GN track iterations.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session6.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { note "relay down; aborting"; exit 1; }

note "1. ATE 120 frames: defaults + cost-gate 3.0, refine-every 2, track-iters 12"
timeout 4500 python examples/bench_ate.py --frames 120 \
    --refine-cost-gate 3.0 --refine-every 2 --track-iters 12 >> "$LOG" 2>&1

note "2. re-warm driver bench cache"
timeout 590 python bench.py >> "$LOG" 2>&1

note "done"
