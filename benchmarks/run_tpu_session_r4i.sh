#!/bin/bash
# Round-4i sequential TPU session: tiles-per-dispatch (BATCH) sweep on the
# production forward. batch-1 baseline is 103-104 ms (r4b/r4e sessions);
# BATCH=2/4 report PER-TILE ms — measures whether batch-1's MXU
# under-utilisation in the XLA conv stages amortises across stacked tiles.
# One tunnel holder at a time. Launch:
#   setsid nohup bash benchmarks/run_tpu_session_r4i.sh > /tmp/tpu_session_r4i.log 2>&1 &
# NEVER timeout-kill a stage mid-compile (orphaned remote compiles wedge the
# execution plane for ~1-3 h).
set -x
cd /root/repo

echo "=== stage 1: BATCH=2 full forward ($(date +%H:%M:%S))"
BATCH=2 ONLY=full python benchmarks/bench_ablate.py \
  > /tmp/bench_ablate_r4i_b2.log 2>&1
tail -3 /tmp/bench_ablate_r4i_b2.log

echo "=== stage 2: BATCH=4 full forward ($(date +%H:%M:%S))"
BATCH=4 ONLY=full python benchmarks/bench_ablate.py \
  > /tmp/bench_ablate_r4i_b4.log 2>&1
tail -3 /tmp/bench_ablate_r4i_b4.log

echo "=== TPU SESSION r4i DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_ablate_r4i_b2.log /tmp/bench_ablate_r4i_b4.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
