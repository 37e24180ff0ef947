#!/bin/bash
# Round-4e sequential TPU session: the Pallas tail-conv kernel measurements
# (ops/pallas_conv.py — the four plain conv64 stages). One tunnel holder at a
# time; waits for any earlier precision-delta run to finish first. Launch:
#   setsid nohup bash benchmarks/run_tpu_session_r4e.sh > /tmp/tpu_session_r4e.log 2>&1 &
# NEVER timeout-kill a stage mid-compile (orphaned remote compiles wedge the
# execution plane for ~1-3 h).
set -x
cd /root/repo

while pgrep -f "bench_precision_delta" > /dev/null 2>&1; do sleep 30; done

echo "=== stage 1: conv-kernel in-model ablation ($(date +%H:%M:%S))"
ONLY=full,conv_fused,conv_fused_bf16mxu,all_pallas_bf16mxu \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r4e_conv.log 2>&1
tail -6 /tmp/bench_ablate_r4e_conv.log

echo "=== TPU SESSION r4e DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_ablate_r4e_conv.log /tmp/bench_precision_delta_r4f.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
