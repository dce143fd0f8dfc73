#!/bin/bash
# On-chip measurement roundup (round 5 edition) — the round-closing
# ritual: run at round end and COMMIT the log (benchmarks/roundup_rNN.log)
# so every "bit-identical on chip" claim has a same-round artifact.
# Order matters: correctness gates first, then the accuracy re-mint, then
# the bench records, then the attribution ablation (longest).  Later
# steps still run when a gate fails (data beats automation during a short
# relay window) but the failure is banner-logged and the script exits
# nonzero — do NOT flip bench defaults unless step 1 passed.
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
  echo "=== 2. EVAL re-mint (reference-binary accuracy gate) ==="
  if [ ! -x /tmp/refbuild/bin/srcnn ]; then
    # a partial/interrupted prior build must not survive: cp -r into an
    # existing dir would NEST the source (/tmp/refbuild/reference)
    rm -rf /tmp/refbuild
    cp -r /root/reference /tmp/refbuild && make -C /tmp/refbuild
  fi
  timeout 2400 python benchmarks/eval_suite.py \
    --ref-bin=/tmp/refbuild/bin/srcnn --out=EVAL.md --json=EVAL.json \
    || FAIL=1
  echo "=== 3a. bench x2 fused (the headline; default) ==="
  timeout 1800 python bench.py || FAIL=1
  echo "=== 3b. bench x2 exact ==="
  BENCH_RESIZE=exact timeout 1800 python bench.py || FAIL=1
  echo "=== 3c. bench x1.5 / x3 / x1.25 (per-scale records) ==="
  BENCH_SCALE=1.5 timeout 1800 python bench.py || FAIL=1
  BENCH_SCALE=3 timeout 1800 python bench.py || FAIL=1
  BENCH_SCALE=1.25 timeout 1800 python bench.py || FAIL=1
  echo "=== 3d. 4K30 stream sustained-rate record (config 5) ==="
  timeout 1800 python -c "from srcnn_cpp_tpu.runtime import enable_compilation_cache; enable_compilation_cache(); from srcnn_cpp_tpu.stream import run_synthetic_device; print(run_synthetic_device(96, (1080, 1920), 2.0, batch=8, depth=3))" || FAIL=1
  echo "=== 4. pipe ablation (fused attribution) ==="
  timeout 3600 python benchmarks/profile.py pipe || FAIL=1
  echo "=== 5. sweeps (optional tuning / fallback quantification) ==="
  timeout 1800 python benchmarks/profile.py mesh || true
  timeout 1800 python benchmarks/ab.py prefuse || true
  timeout 1800 python benchmarks/ab.py ablate packed || true
  date
  echo "roundup_exit=$FAIL"
  exit $FAIL
} 2>&1 | tee "$LOG"
exit "${PIPESTATUS[0]}"
