#!/bin/bash
# Re-arm relay_watch until the deadline so MULTIPLE healthy windows each
# fire a full measurement ladder (replication; round-4 VERDICT #5 needs
# >=2 windows per A/B). Waits for any existing watcher first.
# Usage: watch_supervisor.sh <deadline_epoch> [existing_watcher_pid]
set -u
DEADLINE=$1
EXISTING=${2:-}
cd "$(dirname "$0")/.."
if [ -n "$EXISTING" ]; then
    while kill -0 "$EXISTING" 2>/dev/null; do sleep 60; done
fi
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    LEFT_H=$(( (DEADLINE - $(date +%s)) / 3600 + 1 ))
    echo "# supervisor: arming relay_watch for ${LEFT_H}h" >> /tmp/relay_watch.log
    python tools/relay_watch.py --interval 300 --max-hours "$LEFT_H" \
        >> /tmp/relay_watch.log 2>&1
    # rc 0 = a session fired; pause briefly, then re-arm for another window
    sleep 120
done
echo "# supervisor: deadline reached" >> /tmp/relay_watch.log
