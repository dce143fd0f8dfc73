"""Chained in-jit ablation of the e2e pipeline at the bench geometry.

Standalone per-stage dispatches are floored by the ~9 ms relay round-trip,
so stage costs here are attributed by DIFFERENCING chained whole-pipeline
variants (each variant is one jit, dispatches chained with a data
dependency exactly like bench.py, interleaved best-of-N):

  full        : color-in + resize(dense-h) + conv(pallas) + strips + color-out
  block-h     : same but block-banded horizontal resize pass
  phase-h     : same but lane-phase strided-slice horizontal pass
  int-color   : same as full but int32 fixed-point color (the pre-f32 form)
  no-edgefix  : full minus the left/right strip recompute (per-frame conv)
  no-pack     : full with the per-frame lax.map conv (no lane packing)
  no-conv     : full minus SRCNN (bicubic-only pipeline)
  fused-pre   : Pallas color+bicubic pre-pass (ops/pallas_resize.py)
  fused-post  : Pallas merge+inverse-color post-pass (ops/pallas_merge.py)
  fused-both  : both Pallas passes (the --resize=fused pipeline)

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pipe_ablate.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.color import (_CB2B, _CB2G, _CR2G, _CR2R, _B2Y, _G2Y,
                                     _R2Y, _R2CR, _B2CB, _DELTA, _HALF,
                                     _SHIFT, bgr2ycrcb_u8_planar,
                                     ycrcb2bgr_u8_planar)
from srcnn_cpp_tpu.ops.pallas_srcnn import (_fused_call, _pick_tiles,
                                            _prep_weights, srcnn_y_fused)
from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8, scaled_size
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

BATCH = 32
H, W = 540, 960
ITERS = 6


def _descale_i(x):
    return (x + _HALF) >> _SHIFT


def bgr2ycrcb_int(bgr_p):
    x = bgr_p.astype(jnp.int32)
    b, g, r = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    y = _descale_i(b * _B2Y + g * _G2Y + r * _R2Y)
    cr = _descale_i((r - y) * _R2CR + _DELTA)
    cb = _descale_i((b - y) * _B2CB + _DELTA)
    return jnp.clip(jnp.stack([y, cr, cb], axis=-3), 0, 255).astype(jnp.uint8)


def ycrcb2bgr_int(ycrcb_p):
    x = ycrcb_p.astype(jnp.int32)
    y, cr, cb = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    b = y + _descale_i((cb - 128) * _CB2B)
    g = y + _descale_i((cb - 128) * _CB2G + (cr - 128) * _CR2G)
    r = y + _descale_i((cr - 128) * _CR2R)
    return jnp.clip(jnp.stack([b, g, r], axis=-3), 0, 255).astype(jnp.uint8)


def main() -> None:
    enable_compilation_cache()
    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(W, H, 2.0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (BATCH, 3, H, W), dtype=np.uint8))

    th, tw = _pick_tiles(oh, ow)
    hp = ((oh + th - 1) // th) * th
    wp = ((ow + tw - 1) // tw) * tw
    packed = jax.tree_util.tree_map(jnp.asarray, _prep_weights(weights))

    def pipe(x, *, color="f32", hmode="dense", conv="fused", edgefix=True,
             pack=True, pre="engine", post="engine"):
        if pre == "pallas":
            from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused

            up = pre_upscale_fused(x, (oh, ow))
            assert up is not None, "no phase plan at the bench geometry?"
        else:
            ycc = (bgr2ycrcb_int if color == "int" else bgr2ycrcb_u8_planar)(x)
            up = resize_bicubic_u8(ycc, (oh, ow), hmode)
        if conv == "none":
            y_sr = up[:, 0]
        elif not edgefix:
            y = jnp.pad(up[:, 0], ((0, 0), (6, 10 + hp - oh),
                                   (6, 122 + wp - ow)), mode="edge")
            y_sr = jax.lax.map(
                lambda p: _fused_call(p, packed, th, tw, true_h=oh),
                y)[:, :oh, :ow]
        else:
            y_sr = srcnn_y_fused(up[:, 0], weights, pack=pack)
        if post == "pallas":
            from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused

            out = merge_ycrcb_to_bgr_fused(y_sr, up)
            assert out is not None
            return out
        merged = jnp.stack([y_sr, up[:, 1], up[:, 2]], axis=-3)
        return (ycrcb2bgr_int if color == "int" else ycrcb2bgr_u8_planar)(
            merged)

    variants = {
        "full": jax.jit(partial(pipe)),
        "block-h": jax.jit(partial(pipe, hmode="block")),
        "phase-h": jax.jit(partial(pipe, hmode="phase")),
        "int-color": jax.jit(partial(pipe, color="int")),
        "no-edgefix": jax.jit(partial(pipe, edgefix=False)),
        "no-pack": jax.jit(partial(pipe, pack=False)),
        "no-conv": jax.jit(partial(pipe, conv="none")),
        "fused-pre": jax.jit(partial(pipe, pre="pallas")),
        "fused-post": jax.jit(partial(pipe, post="pallas")),
        "fused-both": jax.jit(partial(pipe, pre="pallas", post="pallas")),
    }

    def chain(fn, n):
        dep = jnp.zeros((), jnp.uint8)
        out = None
        for _ in range(n):
            out = fn(frames.at[0, 0, 0, 0].add(dep))
            dep = out[0, 0, 0, 0] * 0
        np.asarray(dep)
        return out

    for name, fn in variants.items():
        chain(fn, 2)
        print("compiled", name, flush=True)

    best = {name: float("inf") for name in variants}
    for rep in range(5):
        for name, fn in variants.items():
            t0 = time.monotonic()
            chain(fn, ITERS)
            best[name] = min(best[name], (time.monotonic() - t0) / ITERS)

    mp = BATCH * oh * ow / 1e6
    print(f"\nbatch {BATCH} x {ow}x{oh} = {mp:.1f} MP/dispatch (chained)")
    for name in variants:
        print(f"{name:>11}: {best[name]*1e3:7.2f} ms  {mp/best[name]:7.1f} MP/s")
    print(f"\nstrips (full - no-edgefix)  : "
          f"{1e3*(best['full'] - best['no-edgefix']):6.2f} ms")
    print(f"conv+strips (full - no-conv): "
          f"{1e3*(best['full'] - best['no-conv']):6.2f} ms")
    print(f"block-h cost (block-h - full): "
          f"{1e3*(best['block-h'] - best['full']):6.2f} ms")
    print(f"f32-color gain (int - full)  : "
          f"{1e3*(best['int-color'] - best['full']):6.2f} ms")
    print(f"pack gain (no-pack - full)   : "
          f"{1e3*(best['no-pack'] - best['full']):6.2f} ms")
    print(f"fused-pre gain (full - fused-pre)  : "
          f"{1e3*(best['full'] - best['fused-pre']):6.2f} ms")
    print(f"fused-post gain (full - fused-post): "
          f"{1e3*(best['full'] - best['fused-post']):6.2f} ms")
    print(f"fused-both gain (full - fused-both): "
          f"{1e3*(best['full'] - best['fused-both']):6.2f} ms")


if __name__ == "__main__":
    main()
