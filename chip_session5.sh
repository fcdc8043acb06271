#!/bin/bash
# Fifth serial chip session.  Session-4 stage 1 showed refine-every 2 is
# DESTABILIZING (32.9 cm vs 6.52 at refine-every 4: map-anchored absolute
# edges re-tracked against a still-immature map inject errors, and each
# refinement re-anchors the map by those corrections — compounding).  This
# session isolates the mapping-effort variables at the proven cadence.
# NEVER overlap with another chip job (the relay wedges ~20 min).
set -u
cd /root/repo
LOG=chip_session5.log
: > "$LOG"
note() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe (relay may be wedged ~20 min after the stage-4 kill)"
for i in 1 2 3 4 5 6 7 8; do
    timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
        && break
    note "probe $i failed; retrying"
    sleep 120
done

note "1. ATE 120 frames: map-iters 30, window 6 (refine-every 4)"
timeout 5400 python examples/bench_ate.py --frames 120 \
    --map-iters 30 --window 6 >> "$LOG" 2>&1

note "2. re-warm driver bench cache"
timeout 590 python bench.py >> "$LOG" 2>&1

note "done"
