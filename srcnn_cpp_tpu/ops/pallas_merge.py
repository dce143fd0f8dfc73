"""Fused merge + YCrCb->BGR Pallas kernel (the post-pass).

The reference's last two pipeline stages are ``merge([Y', Cr, Cb])``
(src/srcnn.cpp:638-639) and ``cvtColor(YCrCb2BGR)`` (src/srcnn.cpp:657).
In the XLA pipeline those are a channel stack + the fixed-point inverse
conversion — a full-plane u8 intermediate written to and re-read from
HBM plus whatever relayouts the stack needs.  This kernel does both in
one pass over output tiles: read the super-resolved Y tile and the
upscaled Cr/Cb tiles, run OpenCV's 14-bit fixed-point inverse transform
in exact f32, clip, and write the planar BGR u8 tile.  Per frame the
post-pass becomes one read of each input plane + one BGR write.

Numerics are IDENTICAL to ``ycrcb2bgr_u8_planar`` on every backend:
every product and sum in the inverse transform is an integer of
magnitude < 2^23 (exact in f32 regardless of FMA contraction — an FMA
of exactly-representable values with an exactly-representable result
rounds to that result), so unlike the pre-pass's vertical resize there
is no boundary-rounding hazard; CPU tests assert bit equality.

The kernel reads the full 3-channel ``up`` block and uses only Cr/Cb —
blocked indexing cannot express a channel-1..2 window, and the extra
Y-channel read costs ~1/6 of the post-pass HBM traffic, far less than a
materialized ``up[:, 1:]`` slice would.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .color import _CB2B, _CB2G, _CR2G, _CR2R, _descale_f32

__all__ = ["merge_ycrcb_to_bgr_fused"]


def _kernel(y_ref, up_ref, out_ref):
    """One (3, th, tw) BGR tile from Y' (th, tw) and up-YCrCb (3, th, tw).

    Channels are computed and written one at a time (instead of a stacked
    3-plane store): only ~4 f32 planes are ever live, which lets the tile
    policy grow rows ~2x before VMEM pressure — fewer grid steps matter
    because the post-pass is per-tile-overhead-bound, not VPU-bound
    (round-4 preablate methodology; same finding as the pre-pass).
    Bit-identical: the per-element op sequence is unchanged.
    """
    y = y_ref[0].astype(jnp.int32).astype(jnp.float32)
    cr = up_ref[0, 1].astype(jnp.int32).astype(jnp.float32) - 128.0
    cb = up_ref[0, 2].astype(jnp.int32).astype(jnp.float32) - 128.0

    def store(c, plane):
        # Mosaic has no direct f32->u8 cast; truncate via i32 (identical
        # to the XLA engine's truncation for clipped non-negative values)
        out_ref[0, c] = jnp.clip(plane, 0.0, 255.0) \
            .astype(jnp.int32).astype(jnp.uint8)

    store(0, y + _descale_f32(cb * _CB2B))
    store(1, y + _descale_f32(cb * _CB2G + cr * _CR2G))
    store(2, y + _descale_f32(cr * _CR2R))


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def _merge_call(y_sr, up, th, tw):
    nb, oh, ow = y_sr.shape
    return pl.pallas_call(
        _kernel,
        # ceil grids: tile shapes need not divide the plane — Pallas masks
        # the ragged boundary blocks (reads pad, writes crop)
        grid=(nb, -(-oh // th), -(-ow // tw)),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, 3, th, tw), lambda b, i, j: (b, 0, i, j)),
        ],
        out_specs=pl.BlockSpec((1, 3, th, tw), lambda b, i, j: (b, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((nb, 3, oh, ow), jnp.uint8),
        interpret=jax.default_backend() == "cpu",
    )(y_sr, up)


def merge_ycrcb_to_bgr_fused(y_sr, up, tile: tuple[int, int] | None = None):
    """``Y' [B, oh, ow]`` + upscaled YCrCb ``[B, 3, oh, ow]`` -> BGR u8.

    Bit-identical to ``ycrcb2bgr_u8_planar(stack([y_sr, up[:,1], up[:,2]]))``
    on every backend.  Tile shapes are (8, 128)-aligned; ragged edges ride
    Pallas's masked boundary blocks, so every geometry is covered.  Returns
    None only for planes too small to be worth a kernel launch; the caller
    falls back to the XLA path.  ``tile`` overrides the (th, tw) policy
    for on-chip sweeps (benchmarks/ab.py prepost).
    """
    nb, oh, ow = y_sr.shape
    if oh < 8 or ow < 128:
        return None
    if tile is not None:
        th, tw = tile
    else:
        tw = min(1920, -(-ow // 128) * 128)
        # bound tile area: ~6 live f32 intermediates stay ~3 MB of VMEM
        th = min(max(8, (128 * 1024) // tw // 8 * 8), -(-oh // 8) * 8)
    return _merge_call(y_sr, up, th, tw)
