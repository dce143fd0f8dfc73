#!/bin/bash
# On-chip measurement roundup (round 4 edition).
# Run from /root/repo the moment the TPU relay answers; logs everything.
# Order matters: correctness gates first, then the bench records, then
# the attribution ablation (longest).  Later steps still run when a gate
# fails (data beats automation during a short relay window) but the
# failure is banner-logged and the script exits nonzero — do NOT flip
# bench defaults unless step 1 passed.
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
  echo "=== 2a. bench x2 fused (the headline; default) ==="
  timeout 1800 python bench.py || FAIL=1
  echo "=== 2b. bench x2 exact ==="
  BENCH_RESIZE=exact timeout 1800 python bench.py || FAIL=1
  echo "=== 2c. bench x1.5 / x3 / x1.25 (per-scale records) ==="
  BENCH_SCALE=1.5 timeout 1800 python bench.py || FAIL=1
  BENCH_SCALE=3 timeout 1800 python bench.py || FAIL=1
  BENCH_SCALE=1.25 timeout 1800 python bench.py || FAIL=1
  echo "=== 3. pipe ablation (fused attribution) ==="
  timeout 3600 python benchmarks/profile.py pipe || FAIL=1
  echo "=== 4. kernel/pre/post sweeps (optional tuning) ==="
  timeout 1800 python benchmarks/ab.py ablate packed || true
  timeout 1800 python benchmarks/ab.py prepost pre || true
  timeout 1800 python benchmarks/ab.py prepost post || true
  date
  echo "roundup_exit=$FAIL"
  exit $FAIL
} 2>&1 | tee "$LOG"
exit "${PIPESTATUS[0]}"
