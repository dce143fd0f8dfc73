"""Throughput benchmark: megapixels/sec of x2 super-resolution on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Config matches the measured reference baseline (BASELINE_MEASURED.md):
test.jpg-sized frames (960x540 BGR) upscaled x2 to 1920x1080 through the
full pipeline (color convert + bicubic x3 channels + SRCNN on Y + merge).
The reference binary does 0.0707 MP/s on this host at x2 (idle-host
4-OMP-core re-measurement, BASELINE_MEASURED.md); ``vs_baseline`` is the
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

# reference-binary throughput on this host per scale — the round-5
# IDLE-HOST re-measurement (best-of-N, 4 OMP cores; BASELINE_MEASURED.md).
# Round 1's anchors (x2 = 0.0178) were taken under a 1-core condition and
# flattered the framework ~4x; vs_baseline uses the FASTER, reference-
# favorable numbers.
_BASELINE_MPS = {0.75: 0.0685, 1.25: 0.0664, 1.5: 0.0653, 2.0: 0.0707,
                 3.0: 0.0801}
SCALE = float(os.environ.get("BENCH_SCALE", "2"))
BASELINE_MPS = _BASELINE_MPS.get(SCALE, 0.0707)
# batch 64 at x3 exceeds single-chip HBM (the x3 output planes alone are
# ~0.9 GB plus resize intermediates — measured ResourceExhausted); halve
# the default there, overridable as always.  x2 runs batch 128: the
# round-5 sweep (profile.py batch 540x960 64..256) measured 64→1620,
# 96→1671, 128→1701-1722, 192→1678, 256→1702 MP/s same-process — the
# curve saturates at 128.
BATCH = int(os.environ.get("BENCH_BATCH", "32" if SCALE >= 3 else "128"))
# chain length measures the sustained steady state: the round-5 sweep at
# batch 128 gave 6 -> 1,745 / 12 -> 1,778 / 24 -> 1,792 / 48 -> 1,800
# MP/s (one-time ramp effects amortize); 48 keeps the warm-cache inner
# run under ~45 s, well inside the degraded-mode reserve
ITERS = int(os.environ.get("BENCH_ITERS", "48"))
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


# a trivial jit through the relay: proves backend init + compile + execute
# + host fetch all work before any multi-minute attempt is committed
# (round 4 lost its record to two blind 850 s attempts against what was
# likely a dead/cold relay — rc=124 before any output)
_PROBE_SRC = (
    "from srcnn_cpp_tpu.runtime import enable_compilation_cache;"
    "enable_compilation_cache();"
    "import jax, jax.numpy as jnp, numpy as np;"
    "np.asarray(jax.jit(lambda a: a + 1)(jnp.ones((8, 128), jnp.float32)));"
    "print('PROBE_OK')"
)

# retry only plausibly-transient failures (relay outage, timeout); a
# deterministic compile error fails the same way every attempt — burn
# no budget on it (round 3 lost 6 min retrying a Mosaic
# NotImplementedError before this guard existed)
_DETERMINISTIC = (b"NotImplementedError", b"Mosaic failed to compile",
                  b"Unsupported cast", b"unsupported shape cast")


def _child(args: list, env: dict | None, timeout: float):
    """Run a python child; returns (rc, stdout, stderr); rc=124 on timeout."""
    import subprocess
    import sys

    try:
        proc = subprocess.run([sys.executable, *args],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, timeout=timeout)
    except subprocess.TimeoutExpired as exc:
        return 124, exc.stdout or b"", exc.stderr or b""
    return proc.returncode, proc.stdout, proc.stderr


def _run_with_retries() -> int:
    """Run the benchmark under a HARD total wall budget (default 25 min).

    Structure (the round-4 postmortem, hardened again after the round-5
    ritual caught a slow-relay window degrading the record):
      1. liveness probe — a trivial jit (<10 s warm) must succeed before
         any full attempt is committed, so a dead relay costs probe-sized
         retries, not attempt-sized ones; the probe cap escalates because
         backend init itself varies 4 s - minutes;
      2. a FALLBACK LADDER of configs — full (batch 128 x 48 chains),
         then batch 64 x 12 (~40 s warm, still a ~1,700 MP/s record),
         then batch 16 x 2 as the last resort — each rung bounded so the
         later rungs always keep their reserve.  All three shapes are
         pre-warmed in the persistent compile cache.

    Worst case this exits in ~budget seconds with either a record or a
    clear stderr trail — never a silent rc=124 from the driver's side.
    (Round-4's driver killed the harness only after >=32 min; 25 min
    leaves margin below that while riding out multi-minute relay
    slowdowns that 14 min could not.)
    """
    import os
    import sys

    budget = float(os.environ.get("BENCH_WALL_BUDGET", "1500"))
    deadline = time.monotonic() + budget

    def remaining() -> float:
        return deadline - time.monotonic()

    inner = [os.path.abspath(__file__), "--inner"]
    reserve = 210.0  # kept back PER remaining fallback rung

    # phase 1: liveness (cheap; loop until the relay answers or ~2 min
    # of budget is all that's left).  The per-probe timeout ESCALATES:
    # backend init through the relay varies 4 s - minutes, and a fixed
    # 75 s cap would loop forever on an init that consistently needs
    # more (observed: probe success only after retries, "105 s in")
    probe_try = 0
    while True:
        probe_try += 1
        cap = min(75.0 * probe_try, max(60.0, remaining() - reserve - 60))
        rc, out, _ = _child(["-c", _PROBE_SRC], None, cap)
        if rc == 0 and b"PROBE_OK" in out:
            print(f"bench: probe ok ({budget - remaining():.0f}s in)",
                  file=sys.stderr)
            break
        print(f"bench: liveness probe {probe_try} failed "
              f"(relay down/cold, cap {cap:.0f}s); retrying", file=sys.stderr)
        if remaining() < reserve + 120:
            print("bench: relay never answered within budget", file=sys.stderr)
            return 1
        time.sleep(20)

    # phase 2: the fallback ladder — each rung bounded so later rungs
    # always keep their reserve; a smaller-but-valid record beats an
    # empty round.  The middle rung halves the scale's OWN default batch
    # (a fixed 64 would ResourceExhaust at x3, whose default is already
    # the HBM-bounded 32)
    ladder = ({},
              {"BENCH_BATCH": str(max(16, BATCH // 2)), "BENCH_ITERS": "12"},
              {"BENCH_BATCH": "16", "BENCH_ITERS": "2"})
    rung = 0
    while rung < len(ladder):
        overrides = ladder[rung]
        name = "full" if not overrides else (
            f"fallback {'/'.join(overrides.values())}")
        env = dict(os.environ, **overrides) if overrides else None
        floor = reserve * (len(ladder) - 1 - rung)
        attempt = 0
        advanced = False
        while remaining() > floor + 60:
            attempt += 1
            rc, out, err = _child(inner, env, max(60.0, remaining() - floor))
            sys.stderr.buffer.write(err)
            sys.stderr.flush()
            if rc == 0 and out.strip():
                if overrides:
                    print(f"bench: {name} record", file=sys.stderr)
                sys.stdout.buffer.write(out)
                sys.stdout.flush()
                return 0
            print(f"bench: {name} attempt {attempt} rc={rc}",
                  file=sys.stderr)
            if any(sig in err for sig in _DETERMINISTIC):
                print("bench: deterministic compile error — jumping to the "
                      "last rung", file=sys.stderr)
                # retrying the same error is pointless: jump to the last
                # rung, or give up if already there
                rung = len(ladder) - 1 if rung < len(ladder) - 1 \
                    else len(ladder)
                advanced = True
                break
            # a TIMEOUT consumed this rung's whole window (relay slow —
            # drop a rung rather than burn the budget again); a FAST
            # transient failure is retried up to 3 times before demoting,
            # so a one-off blip does not cost the full-config record
            if rung < len(ladder) - 1 and (rc == 124 or attempt >= 3):
                rung += 1
                advanced = True
                break
            time.sleep(min(15, max(0, remaining() - floor - 60)))
        if not advanced:
            rung += 1              # out of time for this rung
    print("bench: every rung failed; no record", file=sys.stderr)
    return 1


if __name__ == "__main__":
    import sys

    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(_run_with_retries())
