#!/bin/bash
# Round-4 TPU session B: retry of r4a after two fixes — the fused tail's
# zero-shift roll (Mosaic rejects zero-size slices; pallas_kernels.py:777)
# and bench_continent's shadowed os import. 'full' was already measured in
# r4a stage 1 (115.04 ms, matching r3's 115.3) and is not repaid here.
# One sequential chain — the axon tunnel admits ONE process. Launch detached;
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

echo "=== stage 1: fused-tail in-model ablation fp32 ($(date +%H:%M:%S))"
ONLY=tail_fused,tail_fused_packed python benchmarks/bench_ablate.py \
  > /tmp/bench_ablate_r4b_tail.log 2>&1
tail -5 /tmp/bench_ablate_r4b_tail.log

echo "=== stage 2: in-model bf16 ablation ($(date +%H:%M:%S))"
ONLY=bf16,bf16_tail_fused python benchmarks/bench_ablate.py \
  > /tmp/bench_ablate_r4b_bf16.log 2>&1
tail -4 /tmp/bench_ablate_r4b_bf16.log

# pick the fused-tail body by measurement (packed vs unpacked)
PACK=$(python - <<'EOF'
import json
try:
    line = [l for l in open("/tmp/bench_ablate_r4b_tail.log") if l.startswith("{")][-1]
    r = json.loads(line)
    print("1" if r.get("tail_fused_packed", 1e9) < r.get("tail_fused", 1e9) else "0")
except Exception:
    print("0")
EOF
)
echo "PACK_TAPS winner: $PACK"

echo "=== stage 3: continent, fused tail ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=$PACK python benchmarks/bench_continent.py host \
  > /tmp/bench_continent_r4_fused.log 2>&1
tail -5 /tmp/bench_continent_r4_fused.log

echo "=== stage 4: headline bench, fused tail ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=$PACK python bench.py > /tmp/bench_headline_r4_fused.log 2>&1
tail -2 /tmp/bench_headline_r4_fused.log

echo "=== stage 5: continent, bf16 + fused tail ($(date +%H:%M:%S))"
TAIL_FUSED=1 PACK_TAPS=$PACK DTYPE=bfloat16 python benchmarks/bench_continent.py host \
  > /tmp/bench_continent_r4_bf16.log 2>&1
tail -5 /tmp/bench_continent_r4_bf16.log

echo "=== TPU SESSION r4b DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_ablate_r4_tail.log /tmp/bench_ablate_r4b_tail.log \
   /tmp/bench_ablate_r4b_bf16.log /tmp/bench_continent_r4_fused.log \
   /tmp/bench_headline_r4_fused.log /tmp/bench_continent_r4_bf16.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
