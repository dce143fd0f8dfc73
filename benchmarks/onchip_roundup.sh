#!/bin/bash
# Round-3 on-chip measurement roundup (KERNEL_NOTES "Round 3 runbook").
# Run from /root/repo the moment the TPU relay answers; logs everything.
# Order matters: correctness gates first, then the bench records, then
# the attribution ablation (longest).  Later steps still run when a gate
# fails (data beats automation during a short relay window) but the
# failure is banner-logged and the script exits nonzero — do NOT flip
# bench defaults (runbook step 4) unless step 1 passed.
set -x
cd "$(dirname "$0")/.."
# benchmark scripts import srcnn_cpp_tpu from the repo root; keep the axon
# site dir too (it loads the TPU plugin)
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/onchip_roundup_$(date +%H%M).log}
FAIL=0
{
  date
  echo "=== 1. Mosaic correctness gates (test_tpu.py) ==="
  SRCNN_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu.py -q \
    || { FAIL=1; echo "!!! GATES FAILED — do not flip bench defaults !!!"; }
  echo "=== 2a. bench exact ==="
  timeout 1800 python bench.py || FAIL=1
  echo "=== 2b. bench fused ==="
  BENCH_RESIZE=fused timeout 1800 python bench.py || FAIL=1
  echo "=== 3. pipe ablation (fused attribution) ==="
  timeout 3600 python benchmarks/pipe_ablate.py || FAIL=1
  echo "=== 4. pre/post tile sweeps (optional tuning) ==="
  timeout 1800 python benchmarks/prepost_ab.py pre || true
  timeout 1800 python benchmarks/prepost_ab.py post || true
  date
  echo "roundup_exit=$FAIL"
  exit $FAIL
} 2>&1 | tee "$LOG"
exit "${PIPESTATUS[0]}"
