#!/bin/bash
# Round-4k sequential TPU session: the phase-decomposed upsample->conv
# (ops/phase_conv.py — 16/36 the MACs of the literal upsample+conv3x3, no
# materialised 4x intermediate) in-model, alone and stacked with the other
# live levers; then the everything-on continent run. Waits for the r4j
# session (single tunnel holder). Launch:
#   setsid nohup bash benchmarks/run_tpu_session_r4k.sh > /tmp/tpu_session_r4k.log 2>&1 &
# NEVER timeout-kill a stage mid-compile (orphaned remote compiles wedge the
# execution plane for ~1-3 h).
set -x
cd /root/repo

while pgrep -f "run_tpu_session_r4j" | grep -v $$ > /dev/null 2>&1; do sleep 60; done
while pgrep -f "bench_continent|bench.py" > /dev/null 2>&1; do sleep 60; done

echo "=== stage 1: phase-up in-model ablation ($(date +%H:%M:%S))"
ONLY=full,phase_up,phase_up_rdb_bf16mxu \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r4k_phase.log 2>&1
tail -5 /tmp/bench_ablate_r4k_phase.log

echo "=== stage 2: phase-up at batch 2 ($(date +%H:%M:%S))"
BATCH=2 ONLY=phase_up_rdb_bf16mxu \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r4k_phase_b2.log 2>&1
tail -4 /tmp/bench_ablate_r4k_phase_b2.log

echo "=== stage 3: continent, everything on (TPD=2 + rdb_bf16 + phase_up) ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 TPD=2 RDB_BF16=1 PHASE_UP=1 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r4k_all.log 2>&1
tail -4 /tmp/bench_continent_r4k_all.log

echo "=== stage 4: trained-checkpoint output deltas (phase_up, clamp1) ($(date +%H:%M:%S))"
python benchmarks/bench_precision_delta.py > /tmp/bench_precision_delta_r4k.log 2>&1
tail -3 /tmp/bench_precision_delta_r4k.log

echo "=== stage 5: clamp1 + everything in-model ($(date +%H:%M:%S))"
ONLY=clamp1,everything \
  python benchmarks/bench_ablate.py > /tmp/bench_ablate_r4k_clamp.log 2>&1
tail -4 /tmp/bench_ablate_r4k_clamp.log

echo "=== TPU SESSION r4k DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_ablate_r4k_phase.log /tmp/bench_ablate_r4k_phase_b2.log \
   /tmp/bench_continent_r4k_all.log /tmp/bench_precision_delta_r4k.log \
   /tmp/bench_ablate_r4k_clamp.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
