#!/bin/bash
# Round-4 TPU session D: the post-fused-tail trunk lever — bf16 dot
# MULTIPLICANDS inside the fused-RDB kernel (fp32 accumulation; XLA's
# default fp32-conv precision). If the Mosaic fp32 matmul was multi-pass,
# this recovers the passes; if it already downcast, this is a measured tie
# to record. Winner (if any) re-measured on the continent + headline.
# One sequential chain — the axon tunnel admits ONE process. Launch detached;
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

echo "=== stage 1: rdb mxu-bf16 in-model ablation ($(date +%H:%M:%S))"
ONLY=rdb_bf16mxu,rdb_bf16mxu_tail_fused python benchmarks/bench_ablate.py \
  > /tmp/bench_ablate_r4d_mxu.log 2>&1
tail -5 /tmp/bench_ablate_r4d_mxu.log

WIN=$(python - <<'EOF'
import json
try:
    line = [l for l in open("/tmp/bench_ablate_r4d_mxu.log") if l.startswith("{")][-1]
    r = json.loads(line)
    # beat the measured fused-tail full forward (104.2 ms, r4b) by >2 ms
    print("1" if r.get("rdb_bf16mxu_tail_fused", 1e9) < 102.0 else "0")
except Exception:
    print("0")
EOF
)
echo "RDB_BF16 wins: $WIN"

if [ "$WIN" = "1" ]; then
  echo "=== stage 2: continent, mxu-bf16 + fused tail ($(date +%H:%M:%S))"
  TAIL_FUSED=1 PACK_TAPS=1 RDB_BF16=1 python benchmarks/bench_continent.py host \
    > /tmp/bench_continent_r4_mxu.log 2>&1
  tail -5 /tmp/bench_continent_r4_mxu.log

  echo "=== stage 3: headline bench, mxu-bf16 + fused tail ($(date +%H:%M:%S))"
  TAIL_FUSED=1 PACK_TAPS=1 RDB_BF16=1 python bench.py \
    > /tmp/bench_headline_r4_mxu.log 2>&1
  tail -2 /tmp/bench_headline_r4_mxu.log
fi

echo "=== TPU SESSION r4d DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/bench_ablate_r4d_mxu.log /tmp/bench_continent_r4_mxu.log \
   /tmp/bench_headline_r4_mxu.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
