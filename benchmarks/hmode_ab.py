"""In-pipeline dense vs phase horizontal pass at larger input widths.

The dense band's matmul cost scales with iw*ow while the phase form's
interleave penalty scales with the output area only — the 540p A/B chose
dense, but the crossover should flip for wider inputs.  Chained,
interleaved, batch 8 at 1080p->4K.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hmode_ab.py
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from _runner import compile_all, print_table, time_interleaved
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

    def chain(fn, n):
        # chained dispatches (data dependency) so the span measures
        # sustained device throughput, not launch latency
        dep = jnp.zeros((), jnp.uint8)
        out = None
        for _ in range(n):
            out = fn(frames.at[0, 0, 0, 0].add(dep))
            dep = out[0, 0, 0, 0] * 0
        np.asarray(dep)
        return out

    variants = {m: jax.jit(partial(pipe, hmode=m))
                for m in ("dense", "phase")}
    fns, outs = compile_all(
        {m: (lambda fn=fn: chain(fn, ITERS)) for m, fn in variants.items()})
    # device-side equality, scalar fetch (bulk downloads ride a ~10-30
    # MB/s tunnel and would dominate the harness wall clock)
    maxdiff = jax.jit(lambda a, b: jnp.abs(
        a.astype(jnp.int32) - b.astype(jnp.int32)).max())
    for m in ("phase",):
        assert int(maxdiff(outs["dense"], outs[m])) == 0, m

    # each thunk runs ITERS chained dispatches: rescale to per-dispatch
    best = {m: s / ITERS
            for m, s in time_interleaved(fns, rounds=5, iters=1).items()}
    print_table(f"[hmode] batch {BATCH} {W}x{H} -> x2, chained", best,
                BATCH * oh * ow / 1e6)


if __name__ == "__main__":
    main()
