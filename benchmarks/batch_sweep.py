"""Batch-size sweep of the full x2 pipeline at a given input geometry.

Interleaved chained-dispatch spans per batch size; per-frame cost falls
with batch until the packed composite saturates tile width.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/batch_sweep.py \
        [HxW] [batch,batch,...]
    # defaults: 540x960 16,32,64  (bench.py geometry)
    # e.g. the 1080p->4K production config: 1080x1920 4,8,16

Measured 2026-08-17 (TPU v5e, bit-exact path):
    540x960  -> 1080p : 16/32/64 -> 1108/1332/1375 MP/s
    1080p    -> 4K    : 4/8/16   -> 1019/1212/1256 MP/s
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.resize import scaled_size
from srcnn_cpp_tpu.pipeline import _upscale_planar_jit
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

ITERS = 4
#: resize mode for the swept pipeline (the production default is the
#: fused Pallas pre/post passes; BENCH_RESIZE=exact for the XLA engines)
import os

RESIZE = os.environ.get("BENCH_RESIZE", "fused")


def main() -> None:
    hw = sys.argv[1] if len(sys.argv) > 1 else "540x960"
    h, w = (int(v) for v in hw.split("x"))
    batches = [int(v) for v in
               (sys.argv[2] if len(sys.argv) > 2 else "16,32,64").split(",")]

    enable_compilation_cache()
    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(w, h, 2.0)
    rng = np.random.default_rng(0)
    frames = {b: jnp.asarray(rng.integers(0, 256, (b, 3, h, w),
                                          dtype=np.uint8))
              for b in batches}

    def chain(b, n):
        dep = jnp.zeros((), jnp.uint8)
        out = None
        for _ in range(n):
            out = _upscale_planar_jit(frames[b].at[0, 0, 0, 0].add(dep),
                                      weights, (oh, ow), "pallas", RESIZE)
            dep = out[0, 0, 0, 0] * 0
        # completion fence: a host fetch of a dependent scalar (the relay's
        # block_until_ready is not a reliable barrier)
        np.asarray(dep)
        return out

    for b in batches:
        chain(b, 2)
        print("compiled batch", b, flush=True)

    best = {b: float("inf") for b in batches}
    for rep in range(5):
        for b in batches:
            t0 = time.monotonic()
            chain(b, ITERS)
            best[b] = min(best[b], (time.monotonic() - t0) / ITERS)
    for b in batches:
        mp = b * oh * ow / 1e6
        print(f"batch {b:>3}: {best[b]*1e3:7.2f} ms  {mp/best[b]:7.1f} MP/s")


if __name__ == "__main__":
    main()
