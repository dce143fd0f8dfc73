#!/bin/bash
# Round-3 on-chip measurement roundup (KERNEL_NOTES "Round 3 runbook").
# Run from /root/repo the moment the TPU relay answers; logs everything.
# Order matters: correctness gates first, then the bench records, then
# the attribution ablation (longest).
set -x
LOG=${1:-/tmp/onchip_roundup_$(date +%H%M).log}
{
  date
  echo "=== 1. Mosaic correctness gates (test_tpu.py) ==="
  SRCNN_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu.py -q
  echo "=== 2a. bench exact ==="
  timeout 1800 python bench.py
  echo "=== 2b. bench fused ==="
  BENCH_RESIZE=fused timeout 1800 python bench.py
  echo "=== 3. pipe ablation (fused attribution) ==="
  timeout 3600 python benchmarks/pipe_ablate.py
  date
} 2>&1 | tee "$LOG"
