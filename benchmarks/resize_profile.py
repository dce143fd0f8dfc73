"""Stage shares inside the resize+color bucket at the bench geometry.

Interleaved best-of-N spans for: color in (BGR->YCrCb at 960x540),
horizontal pass, full resize (h+v), and color out (YCrCb->BGR at
1920x1080), batch 32 x 3 planes.  Differences attribute the vertical pass.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/resize_profile.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar, ycrcb2bgr_u8_planar
from srcnn_cpp_tpu.ops.resize import (_hband_split, resize_bicubic_u8,
                                      scaled_size)
from srcnn_cpp_tpu.runtime import enable_compilation_cache

BATCH = 32
H, W = 540, 960


def main() -> None:
    enable_compilation_cache()
    ow, oh = scaled_size(W, H, 2.0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (BATCH, 3, H, W), dtype=np.uint8))
    up = jnp.asarray(rng.integers(
        0, 256, (BATCH, 3, oh, ow), dtype=np.uint8))

    mxh, mxl = _hband_split(ow, W)
    mxh, mxl = jnp.asarray(mxh), jnp.asarray(mxl)

    @jax.jit
    def color_in(x):
        return bgr2ycrcb_u8_planar(x)

    @jax.jit
    def hpass(x):
        xb = x.astype(jnp.bfloat16)
        dot = partial(jnp.dot, preferred_element_type=jnp.float32)
        return dot(xb, mxh) + dot(xb, mxl)

    @partial(jax.jit, static_argnums=(1,))
    def full_resize(x, hw):
        return resize_bicubic_u8(x, hw)

    @jax.jit
    def color_out(x):
        return ycrcb2bgr_u8_planar(x)

    fns = {
        "color in  (540p)": lambda: color_in(frames),
        "hpass     (540p)": lambda: hpass(frames),
        "h+v resize(540p)": lambda: full_resize(frames, (oh, ow)),
        "color out(1080p)": lambda: color_out(up),
    }
    for name, fn in fns.items():
        out = fn()
        np.asarray(out.reshape(-1)[:2])
        print("compiled", name, flush=True)

    best = {name: float("inf") for name in fns}
    for rep in range(5):
        for name, fn in fns.items():
            t0 = time.monotonic()
            n = 6
            for _ in range(n):
                out = fn()
            np.asarray(out.reshape(-1)[:2])
            best[name] = min(best[name], (time.monotonic() - t0) / n)
    for name in fns:
        print(f"{name}: {best[name]*1e3:7.2f} ms")
    print(f"vpass (derived): "
          f"{1e3*(best['h+v resize(540p)'] - best['hpass     (540p)']):7.2f} ms")


if __name__ == "__main__":
    main()
