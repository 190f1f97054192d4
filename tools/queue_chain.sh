#!/bin/bash
# Wait for the PREVIOUS queue's completion marker in the watchdog cmd
# log, then run the given queue (one TPU job at a time, CLAUDE.md).
# Usage: nohup tools/queue_chain.sh "<marker>" tools/hw_round4e_queue.sh > /tmp/queue_chain.log 2>&1 &
marker="$1"; shift
while ! grep -q "$marker" /tmp/tpu_watchdog_cmd.log 2>/dev/null; do
  sleep 60
done
echo "$(date -u +%FT%TZ) marker '$marker' seen -> launching: $*"
"$@"
echo "$(date -u +%FT%TZ) chained queue finished rc=$?"
