#!/bin/bash
# Round-4 TPU session C: reference-scale quality runs for VERDICT items 3/5.
#   1. TASK=rough RECIPE=reference — 140-epoch degenerate baseline (the
#      reference's detached no-op adversarial term) with roughness columns.
#   2. TASK=rough RECIPE=healthy — the gan_health Finding-3/4 recipe
#      (differentiable adversarial 0.5 + 100 m instance noise) at the same
#      scale: the fold-back-into-production run.
#   3. TASK=deterministic DTYPE=bfloat16 — bf16 training-quality delta vs
#      the committed fp32 curve (model/logs/quality_run/records.jsonl).
# Each run is resumable; loop until DONE (kill-safe, own time budget).
# One sequential chain — the axon tunnel admits ONE process. Launch detached;
# NEVER timeout-kill a stage mid-compile.
set -x
cd /root/repo

run_until_done () {  # args: logfile, env...
  local log="$1"; shift
  for i in 1 2 3 4 5 6; do
    env "$@" DBMT_TIME_BUDGET=1500 python benchmarks/train_quality_run.py \
      >> "$log" 2>&1
    if grep -q "^DONE" "$log"; then break; fi
  done
  tail -4 "$log"
}

echo "=== stage 1: rough task, reference recipe ($(date +%H:%M:%S))"
run_until_done /tmp/quality_rough_reference.log TASK=rough RECIPE=reference

echo "=== stage 2: rough task, healthy recipe ($(date +%H:%M:%S))"
run_until_done /tmp/quality_rough_healthy.log TASK=rough RECIPE=healthy

echo "=== stage 3: deterministic task, bf16 ($(date +%H:%M:%S))"
run_until_done /tmp/quality_det_bf16.log DTYPE=bfloat16

echo "=== TPU SESSION r4c DONE ($(date +%H:%M:%S))"
mkdir -p /root/repo/benchmarks/tpu_session_logs
cp /tmp/quality_rough_reference.log /tmp/quality_rough_healthy.log \
   /tmp/quality_det_bf16.log \
   /root/repo/benchmarks/tpu_session_logs/ 2>/dev/null || true
