#!/bin/bash
# Round-4n sequential TPU session: the flat-resident trunk (rdb_resident).
# Stage 1 fails fast on any Mosaic issue with the DMA kernel (standalone
# chain, small compile); stage 2 measures the in-model delta at the round-4
# production point (batch 2); stage 3 the continent number with the
# resident trunk on. Launch with a MINIMAL command (no pattern literals):
#   setsid nohup bash benchmarks/run_tpu_session_r4n.sh > /tmp/tpu_session_r4n.log 2>&1 < /dev/null &
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

echo "=== stage 1: standalone resident chain bring-up ($(date +%H:%M:%S))"
BATCH=2 MXU_BF16=1 \
  python benchmarks/bench_rdb_resident.py > /tmp/bench_rdb_resident_r4n.log 2>&1
tail -8 /tmp/bench_rdb_resident_r4n.log
grep -q "DONE" /tmp/bench_rdb_resident_r4n.log || {
  echo "stage 1 FAILED, aborting"; exit 1; }

echo "=== stage 2: in-model delta at the production point ($(date +%H:%M:%S))"
BATCH=2 ONLY=full,rdb_resident \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r4n_resident.log 2>&1
tail -5 /tmp/bench_ablate_r4n_resident.log

echo "=== stage 3: continent with resident trunk ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 RDB_BF16=1 TPD=2 RDB_RESIDENT=1 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r4n_resident.log 2>&1
tail -4 /tmp/bench_continent_r4n_resident.log

echo "=== TPU SESSION r4n DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_rdb_resident_r4n.log /tmp/bench_ablate_r4n_resident.log \
   /tmp/bench_continent_r4n_resident.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
