"""Batch-size sweep of the full pipeline at 960x540 -> x2 (bench config).

Interleaved chained-dispatch spans per batch size; per-frame cost should
fall with batch until the packed composite saturates tile width.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/batch_sweep.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.resize import scaled_size
from srcnn_cpp_tpu.pipeline import _upscale_planar_jit
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

H, W = 540, 960
BATCHES = [16, 32, 64]
ITERS = 6


def main() -> None:
    enable_compilation_cache()
    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(W, H, 2.0)
    rng = np.random.default_rng(0)
    frames = {b: jnp.asarray(rng.integers(0, 256, (b, 3, H, W),
                                          dtype=np.uint8))
              for b in BATCHES}

    def chain(b, n):
        dep = jnp.zeros((), jnp.uint8)
        out = None
        for _ in range(n):
            out = _upscale_planar_jit(frames[b].at[0, 0, 0, 0].add(dep),
                                      weights, (oh, ow), "pallas", "exact")
            dep = out[0, 0, 0, 0] * 0
        np.asarray(dep)
        return out

    for b in BATCHES:
        chain(b, 2)
        print("compiled batch", b, flush=True)

    best = {b: float("inf") for b in BATCHES}
    for rep in range(5):
        for b in BATCHES:
            t0 = time.monotonic()
            chain(b, ITERS)
            best[b] = min(best[b], (time.monotonic() - t0) / ITERS)
    for b in BATCHES:
        mp = b * oh * ow / 1e6
        print(f"batch {b:>3}: {best[b]*1e3:7.2f} ms  {mp/best[b]:7.1f} MP/s")


if __name__ == "__main__":
    main()
