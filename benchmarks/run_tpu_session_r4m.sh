#!/bin/bash
# Round-4m sequential TPU session: in-model attribution AT the round-4
# production operating point (tiles_per_dispatch=2, rdb_mxu_bf16 on, fused
# packed tail) — refreshes the roofline/attribution table that was measured
# at the batch-1 fp32-kernel point. Waits for the r4l session (single
# tunnel holder). Launch with a MINIMAL command (no pattern literals):
#   setsid nohup bash benchmarks/run_tpu_session_r4m.sh > /tmp/tpu_session_r4m.log 2>&1 < /dev/null &
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

while pgrep -f "run_tpu_session_r4l" | grep -v $$ > /dev/null 2>&1; do sleep 60; done
sleep 30

echo "=== stage 1: production-point attribution (full/trunk_6/no_deform at batch 2) ($(date +%H:%M:%S))"
BATCH=2 ONLY=full,trunk_6,no_deform \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r4m_b2attr.log 2>&1
tail -6 /tmp/bench_ablate_r4m_b2attr.log

echo "=== TPU SESSION r4m DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_ablate_r4m_b2attr.log /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
