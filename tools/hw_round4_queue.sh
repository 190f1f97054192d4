#!/bin/bash
# Round-4 pending hardware probes, run strictly one-at-a-time (CLAUDE.md).
# Launched by tools/tpu_watchdog.sh the moment the TPU worker answers.
cd "$(dirname "$0")/.." || exit 1
python tools/hw_round4c.py           > tools/logs/hw_round4c.log 2>&1
python tools/hw_narrow_residual.py   > tools/logs/hw_narrow_residual.log 2>&1
python tools/hw_narrow_batch.py      > tools/logs/hw_narrow_batch.log 2>&1
python bench.py                      > tools/logs/bench_r4.log 2>&1
echo "queue done rc=$?"
