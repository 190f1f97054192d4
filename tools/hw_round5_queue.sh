#!/bin/bash
# Round-5 opening probes, strictly one-at-a-time (CLAUDE.md):
# 0. driver bench sanity
# 1. bench-scale escalation/frame-pool policies (grid-128 = bench scene)
# 2. solver depth histogram at congested scale (deferred from round 4e;
#    REMOVE /tmp/skip_depth_hist first)
cd "$(dirname "$0")/.." || exit 1
rm -f /tmp/skip_depth_hist
python bench.py                    > tools/logs/bench_r5.log 2>&1
python tools/hw_ladder_probe.py 128 > tools/logs/hw_ladder_bench.log 2>&1
python tools/hw_depth_hist.py 1000  > tools/logs/hw_depth_hist.log 2>&1
echo "round5 queue done rc=$?"
