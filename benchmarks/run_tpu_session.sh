#!/bin/bash
# One sequential TPU measurement session — a single process chain so only one
# tunnel holder exists at a time (this image's axon tunnel admits ONE process;
# see docs/NEXT.md env notes). Launch detached and poll the logs:
#   setsid nohup bash benchmarks/run_tpu_session.sh > /tmp/tpu_session.log 2>&1 &
# NEVER timeout-kill any stage mid-compile (orphaned remote compiles wedge the
# execution plane for ~1-3 h).
set -x
cd /root/repo

echo "=== stage 1: tail audit + trunk band sweep ($(date +%H:%M:%S))"
TRUNK_BANDS=36,41 python benchmarks/bench_tail.py > /tmp/bench_tail_r3.log 2>&1
tail -3 /tmp/bench_tail_r3.log

echo "=== stage 2: continent headline, host tile loop ($(date +%H:%M:%S))"
python benchmarks/bench_continent.py host > /tmp/bench_continent_r3.log 2>&1
tail -4 /tmp/bench_continent_r3.log

echo "=== stage 3: bench.py headline ($(date +%H:%M:%S))"
python bench.py > /tmp/bench_headline_r3.log 2>&1
tail -2 /tmp/bench_headline_r3.log

echo "=== TPU SESSION DONE ($(date +%H:%M:%S))"
# persist raw logs into the repo so a later session (or the round-end
# snapshot commit) captures the measurements even if nobody is watching
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_tail_r3.log /tmp/bench_continent_r3.log /tmp/bench_headline_r3.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
