#!/bin/bash
# Follow-up TPU measurement session (round 3, after run_tpu_session.sh):
#   stage 1: deform kernel shootout incl. the v5 software-pipelined body
#   stage 2: deform marshalling piecewise audit (PIECES=1, no trunk sweep)
# One sequential chain — the axon tunnel admits ONE process. Launch detached;
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

echo "=== stage 1: deform shootout v3/v4/v5 ($(date +%H:%M:%S))"
python benchmarks/bench_deform.py > /tmp/bench_deform_r3.log 2>&1
tail -4 /tmp/bench_deform_r3.log

echo "=== stage 2: marshalling pieces audit ($(date +%H:%M:%S))"
PIECES=1 python benchmarks/bench_tail.py > /tmp/bench_pieces_r3.log 2>&1
tail -3 /tmp/bench_pieces_r3.log

echo "=== TPU SESSION 2 DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_deform_r3.log /tmp/bench_pieces_r3.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
