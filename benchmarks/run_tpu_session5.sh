#!/bin/bash
# Third TPU measurement session (round 3): effect of the gather-only
# (transpose-free) deform marshalling on the tile forward and the headline.
# One sequential chain — the axon tunnel admits ONE process. Launch detached;
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

echo "=== stage 1: tail audit (cached compiles) ($(date +%H:%M:%S))"
python benchmarks/bench_tail.py > /tmp/bench_tail_r3d.log 2>&1
tail -3 /tmp/bench_tail_r3d.log

echo "=== stage 2: continent headline, host tile loop ($(date +%H:%M:%S))"
python benchmarks/bench_continent.py host > /tmp/bench_continent_r3d.log 2>&1
tail -4 /tmp/bench_continent_r3d.log

echo "=== stage 3: bench.py headline ($(date +%H:%M:%S))"
python bench.py > /tmp/bench_headline_r3d.log 2>&1
tail -2 /tmp/bench_headline_r3d.log

echo "=== TPU SESSION 3 DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_tail_r3d.log /tmp/bench_continent_r3d.log /tmp/bench_headline_r3d.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
