#!/bin/bash
# Round-5c probes (fresh container, 2026-08-21), one-at-a-time:
# 0. driver bench sanity (also warms the compile cache)
# 1. depth-order probe — settles ordering-vs-glue for the narrow residual
# 2. compensated-precision hardware validation + overhead
cd "$(dirname "$0")/.." || exit 1
python bench.py                      > tools/logs/bench_r5c.log 2>&1
python tools/hw_depth_order.py 1000  > tools/logs/hw_depth_order.log 2>&1
python tools/hw_compensated_probe.py > tools/logs/hw_compensated.log 2>&1
python tools/hw_narrow_order.py 1000 > tools/logs/hw_narrow_order.log 2>&1
echo "round5c queue done rc=$?"
