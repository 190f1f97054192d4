#!/bin/bash
# Round-5b probes (run after the opening queue finishes):
# 0. driver bench re-run (failed in queue 5a: transient backend-unreachable)
# 1. compensated-precision hardware validation + overhead
cd "$(dirname "$0")/.." || exit 1
python bench.py                          > tools/logs/bench_r5.log 2>&1
python tools/hw_compensated_probe.py     > tools/logs/hw_compensated.log 2>&1
echo "round5b queue done rc=$?"
