#!/bin/bash
# Round-4l sequential TPU session: localise the phase-conv delta (in-model
# phase_up measured a tie, bench_ablate_r4k_phase.log) — conv cost vs
# interleave cost at both stages. Waits for the r4k session (single tunnel
# holder). Launch:
#   setsid nohup bash benchmarks/run_tpu_session_r4l.sh > /tmp/tpu_session_r4l.log 2>&1 &
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

while pgrep -f "run_tpu_session_r4k" | grep -v $$ > /dev/null 2>&1; do sleep 60; done
while pgrep -f "bench_continent|bench_ablate|bench_precision" > /dev/null 2>&1; do sleep 60; done

echo "=== stage 1: phase-up piece localisation ($(date +%H:%M:%S))"
python benchmarks/bench_phase_up.py > /tmp/bench_phase_up_r4l.log 2>&1
tail -8 /tmp/bench_phase_up_r4l.log

echo "=== stage 2: bench.py headline at the new production defaults ($(date +%H:%M:%S))"
python bench.py > /tmp/bench_headline_r4l_defaults.log 2>&1
tail -2 /tmp/bench_headline_r4l_defaults.log

echo "=== stage 3: continent at the new production defaults ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=1 TPD=2 RDB_BF16=1 \
  python benchmarks/bench_continent.py host > /tmp/bench_continent_r4l_defaults.log 2>&1 || true
tail -4 /tmp/bench_continent_r4l_defaults.log

echo "=== TPU SESSION r4l DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_phase_up_r4l.log /tmp/bench_headline_r4l_defaults.log \
   /tmp/bench_continent_r4l_defaults.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
