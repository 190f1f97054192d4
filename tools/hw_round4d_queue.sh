#!/bin/bash
# Round-4d probes, strictly one-at-a-time (CLAUDE.md):
# 0. bench.py (the queue's earlier attempt hit a wedged worker)
# 1. grid-1000 regression bisect + escalation ladder (hw_grid_bisect.py)
# 2. solver per-check cost at occupancy 1.0 (hw_solver_rounds.py)
# 3. 16-partner mxu record layout: parity + bench-scale timing
# 4. mxu vs mxu16 fused frames at congested scale
cd "$(dirname "$0")/.." || exit 1
python bench.py                   > tools/logs/bench_r4.log 2>&1
python tools/hw_grid_bisect.py    > tools/logs/hw_grid_bisect.log 2>&1
python tools/hw_solver_rounds.py  > tools/logs/hw_solver_rounds.log 2>&1
python tools/hw_mxu16_probe.py    > tools/logs/hw_mxu16_probe.log 2>&1
python tools/hw_grid1000_probe.py 600 pallas_mxu pallas_mxu16 \
                                  > tools/logs/hw_mxu16_grid600.log 2>&1
python tools/hw_grid1000_probe.py 1000 pallas_mxu pallas_mxu16 \
                                  > tools/logs/hw_mxu16_grid1000.log 2>&1
echo "round4d queue done rc=$?"
