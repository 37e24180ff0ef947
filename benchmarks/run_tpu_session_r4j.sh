#!/bin/bash
# Round-4j sequential TPU session: batched-tile dispatch on the REAL continent
# path (tiles_per_dispatch wired through _make_band_predictor this round;
# bench_ablate_r4i_b{2,4}.log measured 103.1 -> 97.0/96.6 ms/tile in-model).
# Settles whether the win survives the band pipeline, whether rdb_mxu_bf16
# stacks with it, and what the bench.py headline becomes at batch 2.
# One tunnel holder at a time. Launch:
#   setsid nohup bash benchmarks/run_tpu_session_r4j.sh > /tmp/tpu_session_r4j.log 2>&1 &
# NEVER timeout-kill a stage mid-compile (orphaned remote compiles wedge the
# execution plane for ~1-3 h).
set -x
cd /root/repo

echo "=== stage 1: continent TPD=2 (fused+packed tail, fp32) ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 TPD=2 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r4j_tpd2.log 2>&1
tail -4 /tmp/bench_continent_r4j_tpd2.log

echo "=== stage 2: continent TPD=2 + rdb_mxu_bf16 ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 TPD=2 RDB_BF16=1 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r4j_tpd2_bf16.log 2>&1
tail -4 /tmp/bench_continent_r4j_tpd2_bf16.log

echo "=== stage 3: continent TPD=4 (memory/diminishing-returns check) ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 TPD=4 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r4j_tpd4.log 2>&1
tail -4 /tmp/bench_continent_r4j_tpd4.log

echo "=== stage 4: bench.py headline at BATCH=2 ($(date +%H:%M:%S))"
BATCH=2 python bench.py > /tmp/bench_headline_r4j_b2.log 2>&1
tail -3 /tmp/bench_headline_r4j_b2.log

echo "=== TPU SESSION r4j DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_continent_r4j_tpd2.log /tmp/bench_continent_r4j_tpd2_bf16.log \
   /tmp/bench_continent_r4j_tpd4.log /tmp/bench_headline_r4j_b2.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
