"""E2E stage shares at the bench config (960x540 -> 1920x1080, batch 32).

Times three nested spans interleaved: the bare fused conv kernel, the conv
+ edge-frame recompute (srcnn_y_fused), and the full pipeline — the deltas
attribute edge-fix and resize/color cost at the production geometry.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/e2e_profile.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.pallas_srcnn import (_fused_call, _pick_tiles,
                                            _prep_weights, srcnn_y_fused)
from srcnn_cpp_tpu.ops.resize import scaled_size
from srcnn_cpp_tpu.pipeline import _upscale_planar_jit
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

BATCH = 32
H, W = 540, 960


def main() -> None:
    enable_compilation_cache()
    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(W, H, 2.0)
    rng = np.random.default_rng(0)

    frames = jnp.asarray(rng.integers(
        0, 256, (BATCH, 3, H, W), dtype=np.uint8))
    y_up = jnp.asarray(rng.integers(
        0, 256, (BATCH, oh, ow), dtype=np.uint8))
    th, tw = _pick_tiles(oh, ow)
    hp = ((oh + th - 1) // th) * th
    wp = ((ow + tw - 1) // tw) * tw
    y_pad = jnp.pad(y_up, ((0, 0), (6, 10 + hp - oh), (6, 122 + wp - ow)),
                    mode="edge")
    packed = jax.tree_util.tree_map(jnp.asarray, _prep_weights(weights))

    kern_batch = jax.jit(lambda yp: jax.lax.map(
        lambda p: _fused_call(p, packed, th, tw), yp))
    fused_batch = jax.jit(lambda yu: srcnn_y_fused(yu, weights))
    pipe = jax.jit(lambda fr: _upscale_planar_jit(
        fr, weights, (oh, ow), "pallas", "exact"))

    fns = {
        "conv kernel only": lambda: kern_batch(y_pad),
        "conv + edge fix": lambda: fused_batch(y_up),
        "full pipeline": lambda: pipe(frames),
    }
    for name, fn in fns.items():
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
        print(f"compiled {name}", flush=True)

    best = {name: float("inf") for name in fns}
    for rep in range(4):
        for name, fn in fns.items():
            t0 = time.monotonic()
            n = 4
            for _ in range(n):
                out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
            best[name] = min(best[name], (time.monotonic() - t0) / n)

    mp = BATCH * oh * ow / 1e6
    print(f"\nbatch {BATCH} x {ow}x{oh} = {mp:.1f} MP/dispatch")
    for name in fns:
        print(f"{name:>18}: {best[name]*1e3:8.2f} ms  {mp/best[name]:8.1f} MP/s")
    print(f"\nedge-fix cost : {1e3*(best['conv + edge fix'] - best['conv kernel only']):7.2f} ms")
    print(f"resize+color  : {1e3*(best['full pipeline'] - best['conv + edge fix']):7.2f} ms")


if __name__ == "__main__":
    main()
