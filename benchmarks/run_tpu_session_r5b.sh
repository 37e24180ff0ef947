#!/bin/bash
# Round-5b sequential TPU session (r5a reordered after the RRDB kernel fix:
# training numbers land first; RRDB-fused stages follow and may compile for
# 10-30 min each — the Mosaic whole-RRDB compile is slow, priced in).
# Launch with a MINIMAL command (no pattern literals):
#   setsid nohup bash benchmarks/run_tpu_session_r5b.sh > /tmp/tpu_session_r5b.log 2>&1 < /dev/null &
# NEVER timeout-kill a stage mid-compile (a wedged Mosaic compile blocks the
# tunnel for everyone until the remote helper finishes; observed 15 min).
set -x
cd /root/repo

echo "=== stage 1: training MFU + batch sweep ($(date +%H:%M:%S))"
python benchmarks/bench_training.py > /tmp/bench_training_r5.log 2>&1
tail -4 /tmp/bench_training_r5.log
BATCHES=128,256,512 STEPS=20 \
  python benchmarks/bench_train_batch.py > /tmp/bench_train_batch_r5.log 2>&1
tail -6 /tmp/bench_train_batch_r5.log

echo "=== stage 2: RRDB fused-launch bring-up ($(date +%H:%M:%S))"
BATCH=2 MXU_BF16=1 RRDB=1 \
  python benchmarks/bench_rdb_resident.py > /tmp/bench_rdb_rrdb_r5.log 2>&1
tail -12 /tmp/bench_rdb_rrdb_r5.log

echo "=== stage 3: in-model delta at the production point ($(date +%H:%M:%S))"
BATCH=2 ONLY=full,rrdb_fused \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r5_rrdb.log 2>&1
tail -5 /tmp/bench_ablate_r5_rrdb.log

echo "=== stage 4: continent with the RRDB-fused trunk ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 RDB_BF16=1 TPD=2 RDB_RESIDENT=1 RRDB_FUSED=1 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r5_rrdb.log 2>&1
tail -4 /tmp/bench_continent_r5_rrdb.log

echo "=== TPU SESSION r5b DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_training_r5.log /tmp/bench_train_batch_r5.log \
   /tmp/bench_rdb_rrdb_r5.log /tmp/bench_ablate_r5_rrdb.log \
   /tmp/bench_continent_r5_rrdb.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
