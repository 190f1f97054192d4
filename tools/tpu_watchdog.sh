#!/bin/bash
# TPU-worker recovery watchdog (CLAUDE.md outage protocol).
#
# The axon TPU worker can wedge for hours after a timeout-killed client;
# nothing local fixes it.  This loop probes every ~15 min with a tiny
# sum-of-8 under `timeout 60` and, the moment a probe succeeds, launches
# the round-3 hardware measurement suite (tools/hw_round3_suite.py, NOT
# under timeout) exactly once, then exits.  State goes to
# /tmp/tpu_watchdog.state, suite output to /tmp/hw_suite.log.
cd "$(dirname "$0")/.." || exit 1
GRID="${1:-1000}"
while true; do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
assert float(jnp.sum(jnp.arange(8.0))) == 28.0
" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) TPU alive -> launching hw_round3_suite ${GRID}" \
      | tee -a /tmp/tpu_watchdog.state
    python tools/hw_round3_suite.py "$GRID" > /tmp/hw_suite.log 2>&1
    echo "$(date -u +%FT%TZ) suite finished rc=$?" >> /tmp/tpu_watchdog.state
    exit 0
  fi
  echo "$(date -u +%FT%TZ) TPU still wedged" >> /tmp/tpu_watchdog.state
  sleep 870
done
