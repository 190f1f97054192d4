#!/bin/bash
# Round-4 pending hardware probes, run strictly one-at-a-time (CLAUDE.md).
# Launched by tools/tpu_watchdog.sh the moment the TPU worker answers.
#
# Order matters: the 2-pass byte-split placement matmul (replacing
# precision=HIGHEST) changes hardware numerics by design — its exact
# pair-set parity on chip (step 1) gates everything after it.
cd "$(dirname "$0")/.." || exit 1
python tools/hw_round4_verify.py mxu > tools/logs/hw_mxu_2pass_parity.log 2>&1
python tools/hw_round4c.py           > tools/logs/hw_round4c.log 2>&1
python tools/hw_grid1000_stages.py   > tools/logs/hw_grid1000_stages_v2.log 2>&1
python tools/hw_narrow_residual.py   > tools/logs/hw_narrow_residual.log 2>&1
python tools/hw_narrow_batch.py      > tools/logs/hw_narrow_batch.log 2>&1
python bench.py                      > tools/logs/bench_r4.log 2>&1
echo "queue done rc=$?"
