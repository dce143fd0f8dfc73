"""Throughput benchmark: megapixels/sec of x2 super-resolution on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Config matches the measured reference baseline (BASELINE_MEASURED.md):
test.jpg-sized frames (960x540 BGR) upscaled x2 to 1920x1080 through the
full pipeline (color convert + bicubic x3 channels + SRCNN on Y + merge).
The reference binary does 0.0178 MP/s on this host; ``vs_baseline`` is the
speedup over that.

Methodology notes (axon relay environment):
* ``block_until_ready`` is not a reliable fence -> completion is forced by
  fetching the final output to host;
* per-dispatch round-trip is ~9 ms -> frames are batched per dispatch and
  several dispatches are chained with a data dependency so the span
  measures sustained device throughput, not launch latency;
* the relay can be transiently unavailable (round 2 lost its BENCH record
  to an outage) -> the benchmark itself runs in a child process with a
  per-attempt timeout and bounded retry/backoff, so one blip does not
  zero the round's record.
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

# reference-binary throughput on this host per scale (BASELINE_MEASURED.md:
# test.jpg x2 = 0.0178; butterfly x1.5 = 0.0156 and x3 = 0.0240 are the
# closest measured anchors for the non-x2 records — the binary's MP/s is
# nearly resolution-independent)
_BASELINE_MPS = {1.5: 0.0156, 2.0: 0.0178, 3.0: 0.0240}
SCALE = float(os.environ.get("BENCH_SCALE", "2"))
BASELINE_MPS = _BASELINE_MPS.get(SCALE, 0.0178)
# batch 64 at x3 exceeds single-chip HBM (the x3 output planes alone are
# ~0.9 GB plus resize intermediates — measured ResourceExhausted); halve
# the default there, overridable as always
BATCH = int(os.environ.get("BENCH_BATCH", "32" if SCALE >= 3 else "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
# env overrides allow on-chip A/Bs without editing the file
KERNEL = os.environ.get("BENCH_KERNEL", "pallas")  # ops/pallas_srcnn.py
if KERNEL not in ("pallas", "xla", "xla_split"):    # typo -> silent exact/xla
    raise SystemExit(f"bench: unknown BENCH_KERNEL={KERNEL!r}")
# the accuracy-gated configuration: "fused" = the single-pass Pallas
# color+resize pre-pass and merge post-pass (ops/pallas_resize.py,
# ops/pallas_merge.py), verified BIT-IDENTICAL to the exact engines on
# the real chip (tests/test_tpu.py gates, 2026-08-19) and measured
# faster there (1529 vs 1333 MP/s) — so the headline number is still a
# bit-exact path.  "exact" = the XLA banded-matmul engines.
RESIZE = os.environ.get("BENCH_RESIZE", "fused")
if RESIZE not in ("exact", "fast", "fused"):
    raise SystemExit(f"bench: unknown BENCH_RESIZE={RESIZE!r}")


def main() -> None:
    from srcnn_cpp_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from srcnn_cpp_tpu.imageio import imread_bgr
    from srcnn_cpp_tpu.ops.resize import scaled_size
    from srcnn_cpp_tpu.pipeline import _upscale_planar_jit
    from srcnn_cpp_tpu.weights import load_weights

    weights = jax.device_put(load_weights())
    frame = imread_bgr("/root/reference/Pictures/test.jpg")
    if frame is None:  # fall back to synthetic frames of the same geometry
        frame = np.random.default_rng(0).integers(
            0, 256, (540, 960, 3), dtype=np.uint8)
    # planar device layout (HWC's 3-wide lane axis tiles terribly on TPU;
    # the host transpose is how the real pipeline feeds the device too)
    batch = np.ascontiguousarray(
        np.moveaxis(np.broadcast_to(frame, (BATCH,) + frame.shape), -1, 1))
    batch = jax.device_put(jnp.asarray(batch))
    h, w = frame.shape[:2]
    ow, oh = scaled_size(w, h, SCALE)

    import jax as _jax

    @_jax.jit
    def step(x, dep):
        # the chaining data dependency is folded INTO the jitted program:
        # an eager x.at[...].add(dep) would add a full input copy and an
        # extra dispatch of pure measurement scaffolding to every chained
        # iteration; in-jit XLA fuses the add into the first consumer
        return _upscale_planar_jit(x.at[0, 0, 0, 0].add(dep), weights,
                                   (oh, ow), KERNEL, RESIZE)

    def chain(n, dep):
        out = None
        for _ in range(n):
            # data dependency chains the dispatches without reshaping I/O
            out = step(batch, dep)
            dep = out[0, 0, 0, 0] * 0
        # fence on a tiny slice: completion without bulk download (the dev
        # tunnel's ~30 MB/s would otherwise dominate the span; production
        # hosts don't round-trip frames through a debug relay)
        np.asarray(dep)
        return out

    # warm up the pipeline AND the chain's eager helper ops
    chain(2, jnp.zeros((), jnp.uint8))

    t0 = time.monotonic()
    out = chain(ITERS, jnp.zeros((), jnp.uint8))
    dt = time.monotonic() - t0
    mps = BATCH * ITERS * (oh * ow) / 1e6 / dt
    print(json.dumps({
        "metric": f"x{SCALE:g}_sr_throughput_1chip",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_MPS, 1),
    }))


def _run_with_retries() -> int:
    """Run the benchmark in a child process with bounded retry/backoff.

    TPU backend init through the relay can either fail fast (UNAVAILABLE)
    or hang indefinitely; a per-attempt wall-clock timeout handles both.
    The per-attempt budget covers worst-case first-compile latency
    (30 s - 8 min observed); retry 2+ usually rides the persistent
    compilation cache and is much faster.
    """
    import os
    import subprocess
    import sys

    # retry only plausibly-transient failures (relay outage, timeout); a
    # deterministic compile error fails the same way every attempt — burn
    # no backoff on it (round 3 lost 6 min retrying a Mosaic
    # NotImplementedError before this guard existed)
    _DETERMINISTIC = (b"NotImplementedError", b"Mosaic failed to compile",
                      b"Unsupported cast", b"unsupported shape cast")

    delays = (60, 180)  # backoff before attempts 2 and 3
    for attempt in range(len(delays) + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=850)
        except subprocess.TimeoutExpired:
            print(f"bench: attempt {attempt + 1} timed out", file=sys.stderr)
        else:
            sys.stderr.buffer.write(proc.stderr)
            sys.stderr.flush()
            if proc.returncode == 0 and proc.stdout.strip():
                sys.stdout.buffer.write(proc.stdout)
                sys.stdout.flush()
                return 0
            print(f"bench: attempt {attempt + 1} exited rc={proc.returncode}",
                  file=sys.stderr)
            if any(sig in proc.stderr for sig in _DETERMINISTIC):
                print("bench: deterministic compile error — not retrying",
                      file=sys.stderr)
                return 1
        if attempt < len(delays):
            print(f"bench: retrying in {delays[attempt]}s", file=sys.stderr)
            time.sleep(delays[attempt])
    return 1


if __name__ == "__main__":
    import sys

    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(_run_with_retries())
