#!/bin/bash
# Round-4e probes, strictly one-at-a-time (CLAUDE.md):
# 1. multi-operand lax.sort vs argsort+gather (sort_boxes / pack_boxes_ap
#    reorder cost, PERF.md remaining-candidate 5)
# 2. escalation-ladder policies on the congested frame (candidate 2)
cd "$(dirname "$0")/.." || exit 1
python tools/hw_sort_probe.py        > tools/logs/hw_sort_probe.log 2>&1
python tools/hw_ladder_probe.py 1000 > tools/logs/hw_ladder_grid1000.log 2>&1
python tools/hw_depth_hist.py 1000   > tools/logs/hw_depth_hist.log 2>&1
echo "round4e queue done rc=$?"
