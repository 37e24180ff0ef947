#!/bin/bash
# Round-5c: single-sweep RRDB kernel measurement (stage 4 of
# bench_rdb_resident) + headline bench.py at the round-5 defaults.
# Launch: setsid nohup bash benchmarks/run_tpu_session_r5c.sh > /tmp/tpu_session_r5c.log 2>&1 < /dev/null &
set -x
cd /root/repo

echo "=== stage 1: sweep-RRDB bring-up + trunk ($(date +%H:%M:%S))"
BATCH=2 MXU_BF16=1 SWEEP=1 \
  python benchmarks/bench_rdb_resident.py > /tmp/bench_rdb_sweep_r5.log 2>&1
tail -8 /tmp/bench_rdb_sweep_r5.log

echo "=== stage 2: headline bench.py ($(date +%H:%M:%S))"
python bench.py > /tmp/bench_headline_r5.log 2>&1
tail -2 /tmp/bench_headline_r5.log

echo "=== TPU SESSION r5c DONE ($(date +%H:%M:%S))"
cp /tmp/bench_rdb_sweep_r5.log /tmp/bench_headline_r5.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
