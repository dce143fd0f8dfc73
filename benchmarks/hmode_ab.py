"""In-pipeline dense vs phase horizontal pass at larger input widths.

The dense band's matmul cost scales with iw*ow while the phase form's
interleave penalty scales with the output area only — the 540p A/B chose
dense, but the crossover should flip for wider inputs.  Chained,
interleaved, batch 8 at 1080p->4K.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hmode_ab.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar, ycrcb2bgr_u8_planar
from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8, scaled_size
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

BATCH, H, W = 8, 1080, 1920
ITERS = 4


def main() -> None:
    enable_compilation_cache()
    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(W, H, 2.0)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (BATCH, 3, H, W), dtype=np.uint8))

    def pipe(x, hmode):
        ycc = bgr2ycrcb_u8_planar(x)
        up = resize_bicubic_u8(ycc, (oh, ow), hmode)
        y_sr = srcnn_y_fused(up[:, 0], weights)
        return ycrcb2bgr_u8_planar(
            jnp.stack([y_sr, up[:, 1], up[:, 2]], axis=-3))

    variants = {m: jax.jit(partial(pipe, hmode=m))
                for m in ("dense", "phase")}

    def chain(fn, n):
        dep = jnp.zeros((), jnp.uint8)
        out = None
        for _ in range(n):
            out = fn(frames.at[0, 0, 0, 0].add(dep))
            dep = out[0, 0, 0, 0] * 0
        np.asarray(dep)
        return out

    outs = {}
    for m, fn in variants.items():
        outs[m] = np.asarray(chain(fn, 1))
        print("compiled", m, flush=True)
    for m in ("phase",):
        assert np.array_equal(outs["dense"], outs[m]), m

    best = {m: float("inf") for m in variants}
    for rep in range(5):
        for m, fn in variants.items():
            t0 = time.monotonic()
            chain(fn, ITERS)
            best[m] = min(best[m], (time.monotonic() - t0) / ITERS)
    mp = BATCH * oh * ow / 1e6
    for m in variants:
        print(f"{m:>6}: {best[m]*1e3:7.2f} ms  {mp/best[m]:7.1f} MP/s")


if __name__ == "__main__":
    main()
