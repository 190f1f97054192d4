#!/bin/bash
# Round-4d probes, strictly one-at-a-time (CLAUDE.md):
# 0. bench.py (the queue's earlier attempt hit a wedged worker)
# 1. grid-1000 regression bisect + escalation ladder (hw_grid_bisect.py)
# 2. solver per-check cost at occupancy 1.0 (hw_solver_rounds.py)
cd "$(dirname "$0")/.." || exit 1
python bench.py                   > tools/logs/bench_r4.log 2>&1
python tools/hw_grid_bisect.py    > tools/logs/hw_grid_bisect.log 2>&1
python tools/hw_solver_rounds.py  > tools/logs/hw_solver_rounds.log 2>&1
echo "round4d queue done rc=$?"
