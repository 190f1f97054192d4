#!/bin/bash
# Round-5d: decode select-chain re-measurement (one-at-a-time, CLAUDE.md)
cd "$(dirname "$0")/.." || exit 1
python bench.py                      > tools/logs/bench_r5d.log 2>&1
python tools/hw_narrow_order.py 1000 > tools/logs/hw_narrow_order_v2.log 2>&1
echo "round5d queue done rc=$?"
