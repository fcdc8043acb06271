#!/bin/bash
# Polls the axon relay; the moment it is reachable, runs the full serial
# measurement battery (chip_session.sh) ONCE, then keeps a heartbeat probe
# going so the log shows whether the relay stayed up.
#
# Rationale (round 2 post-mortem): the relay was down for the whole session
# and the one manual probe window was missed — a standing watcher converts
# "relay was briefly up at 3am" into measurements.  All chip access must be
# serial (overlapping executions wedge the relay ~20 min), so this script is
# the ONLY process that may touch the chip while it runs.
set -u
cd /root/repo
LOG=chip_watcher.log
: > "$LOG"
note() { echo "[watch $(date +%H:%M:%S)] $*" >> "$LOG"; }

SESSION_DONE=0
for i in $(seq 1 160); do
    note "probe $i"
    if timeout -k 10 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
        if [ "$SESSION_DONE" = 0 ]; then
            note "RELAY UP — running chip_session.sh"
            touch RELAY_UP
            bash chip_session.sh >> "$LOG" 2>&1
            SESSION_DONE=1
            note "chip_session.sh finished (see chip_session.log)"
        else
            note "relay still up (session already done)"
            sleep 600
        fi
    fi
    sleep 180
done
note "watcher exhausted"
