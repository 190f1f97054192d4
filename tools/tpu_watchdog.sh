#!/bin/bash
# TPU-worker recovery watchdog (CLAUDE.md outage protocol).
#
# The axon TPU worker can wedge for hours after a timeout-killed client;
# nothing local fixes it.  This loop probes every ~15 min with a tiny
# sum-of-8 under `timeout 60` and, the moment a probe succeeds, launches
# the given command (NOT under timeout) exactly once, then exits.
#
# Usage:
#   nohup tools/tpu_watchdog.sh [cmd [args...]] > /dev/null 2>&1 &
#
# Default cmd: the full hardware measurement suite at grid 1000.  Probe
# state goes to /tmp/tpu_watchdog.state, command output to
# /tmp/tpu_watchdog_cmd.log.  One command resumes the whole hardware
# campaign unattended — start this the moment an outage is suspected.
cd "$(dirname "$0")/.." || exit 1
if [ "$#" -eq 0 ]; then
  set -- python tools/hw_round3_suite.py 1000
fi
while true; do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
assert float(jnp.sum(jnp.arange(8.0))) == 28.0
" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) TPU alive -> launching: $*" \
      | tee -a /tmp/tpu_watchdog.state
    "$@" > /tmp/tpu_watchdog_cmd.log 2>&1
    echo "$(date -u +%FT%TZ) command finished rc=$?" >> /tmp/tpu_watchdog.state
    exit 0
  fi
  echo "$(date -u +%FT%TZ) TPU still wedged" >> /tmp/tpu_watchdog.state
  sleep 870
done
