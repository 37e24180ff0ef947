#!/bin/bash
# Round-5a sequential TPU session:
#   1. whole-RRDB fused launch bring-up (standalone chain; fails fast on any
#      Mosaic issue with the 3-pass kernel)
#   2. in-model delta at the production point (batch 2, rdb_resident vs
#      rrdb_fused)
#   3. continent number with the RRDB-fused trunk on
#   4. training: reference-scale epoch with MFU + device-batch sweep
# Launch with a MINIMAL command (no pattern literals):
#   setsid nohup bash benchmarks/run_tpu_session_r5a.sh > /tmp/tpu_session_r5a.log 2>&1 < /dev/null &
# NEVER timeout-kill a stage mid-compile (a wedged Mosaic compile blocks the
# tunnel; let it finish or recycle the terminal).
set -x
cd /root/repo

echo "=== stage 1: RRDB fused-launch bring-up ($(date +%H:%M:%S))"
BATCH=2 MXU_BF16=1 RRDB=1 \
  python benchmarks/bench_rdb_resident.py > /tmp/bench_rdb_rrdb_r5a.log 2>&1
tail -12 /tmp/bench_rdb_rrdb_r5a.log
grep -q "DONE" /tmp/bench_rdb_rrdb_r5a.log || {
  echo "stage 1 FAILED, aborting"; exit 1; }

echo "=== stage 2: in-model delta at the production point ($(date +%H:%M:%S))"
BATCH=2 ONLY=full,rrdb_fused \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r5a_rrdb.log 2>&1
tail -5 /tmp/bench_ablate_r5a_rrdb.log

echo "=== stage 3: continent with the RRDB-fused trunk ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 RDB_BF16=1 TPD=2 RDB_RESIDENT=1 RRDB_FUSED=1 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r5a_rrdb.log 2>&1
tail -4 /tmp/bench_continent_r5a_rrdb.log

echo "=== stage 4: training MFU + batch sweep ($(date +%H:%M:%S))"
python benchmarks/bench_training.py > /tmp/bench_training_r5a.log 2>&1
tail -3 /tmp/bench_training_r5a.log
BATCHES=128,256,512 STEPS=20 \
  python benchmarks/bench_train_batch.py > /tmp/bench_train_batch_r5a.log 2>&1
tail -5 /tmp/bench_train_batch_r5a.log

echo "=== TPU SESSION r5a DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_rdb_rrdb_r5a.log /tmp/bench_ablate_r5a_rrdb.log \
   /tmp/bench_continent_r5a_rrdb.log /tmp/bench_training_r5a.log \
   /tmp/bench_train_batch_r5a.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
