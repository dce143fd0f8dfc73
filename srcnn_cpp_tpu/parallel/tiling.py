"""Spatial row-tile sharding with bit-exact halo exchange.

The reference handles large images only by single-node O(W*H) memory
(SURVEY.md §5.7); here one image's rows are sharded across devices and the
conv stack's receptive field is stitched with explicit halo exchange:

* total halo = 6 rows per side — 4 for the 9x9 conv1 "same" padding + 2 for
  the 5x5 conv3 (reference pad geometry, src/srcnn.cpp:271-280, 200-210);
* interior tile edges receive real neighbor rows via ``lax.ppermute`` over
  the ``row`` mesh axis (ICI neighbor exchange, non-periodic);
* true image edges receive replicate (clamp-to-edge) rows, identical to the
  reference's index-clamp LUTs;
* each device then runs the convs VALID in H over its extended tile, so the
  stitched result is bit-identical to the monolithic conv (gate:
  tests/test_tiling.py).

Differentiable end-to-end (ppermute transposes to the reverse permutation),
so the same forward serves sharded training (:mod:`..train`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.quantize import quantize_trunc_u8
from ..ops.srcnn import conv12_f32, conv3_f32

#: receptive-field radius of the 9-5-5 stack (4 + 0 + 2)
HALO = 6


def _halo_exchange_rows(y, halo: int, axis_name: str = "row"):
    """Extend a row-block ``[..., Ht, W]`` by ``halo`` rows on each side.

    Interior seams get neighbor rows (ppermute); the global top/bottom get
    replicate rows, matching clamp-to-edge padding.
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        edge_t = jnp.repeat(y[..., :1, :], halo, axis=-2)
        edge_b = jnp.repeat(y[..., -1:, :], halo, axis=-2)
        return jnp.concatenate([edge_t, y, edge_b], axis=-2)
    idx = lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # i's bottom rows -> i+1's top
    up = [(i + 1, i) for i in range(n - 1)]     # i's top rows -> i-1's bottom
    recv_top = lax.ppermute(y[..., -halo:, :], axis_name, down)
    recv_bot = lax.ppermute(y[..., :halo, :], axis_name, up)
    edge_t = jnp.repeat(y[..., :1, :], halo, axis=-2)
    edge_b = jnp.repeat(y[..., -1:, :], halo, axis=-2)
    top = jnp.where(idx == 0, edge_t, recv_top)
    bot = jnp.where(idx == n - 1, edge_b, recv_bot)
    return jnp.concatenate([top, y, bot], axis=-2)


def _srcnn_rows_f32(y_block, weights, axis_name: str = "row"):
    """Per-device forward on a row block ``[B, Ht, W]`` -> f32 ``[B, Ht, W]``.

    One 6-row input halo exchange covers conv1's 4 and conv3's 2 — but at
    the *true* image edges conv3's padding must be clamped copies of f2's
    edge rows (feature-level replication, srcnn.cpp:200-210), not features
    computed from virtually-extended input; those two rows are overwritten
    accordingly on the first/last device.
    """
    n = lax.axis_size(axis_name)
    ext = _halo_exchange_rows(y_block, HALO, axis_name)        # [B, Ht+12, W]
    f2 = conv12_f32(ext[..., None], weights, pad_h=False)       # [B, Ht+4, W, 32]
    if n == 1:
        f2 = jnp.concatenate(
            [jnp.repeat(f2[..., 2:3, :, :], 2, axis=-3),
             f2[..., 2:-2, :, :],
             jnp.repeat(f2[..., -3:-2, :, :], 2, axis=-3)], axis=-3)
    else:
        idx = lax.axis_index(axis_name)
        top = jnp.where(idx == 0,
                        jnp.repeat(f2[..., 2:3, :, :], 2, axis=-3),
                        f2[..., 0:2, :, :])
        bot = jnp.where(idx == n - 1,
                        jnp.repeat(f2[..., -3:-2, :, :], 2, axis=-3),
                        f2[..., -2:, :, :])
        f2 = jnp.concatenate([top, f2[..., 2:-2, :, :], bot], axis=-3)
    out = conv3_f32(f2, weights, pad_h=False)                   # [B, Ht, W, 1]
    return out[..., 0]


@partial(jax.jit, static_argnames=("mesh",))
def _tiled_call(y, weights, mesh: Mesh):
    fn = shard_map(
        lambda w, x: quantize_trunc_u8(_srcnn_rows_f32(x, w)),
        mesh=mesh,
        in_specs=(P(), P("data", "row", None)),
        out_specs=P("data", "row", None),
    )
    return fn(weights, y)


def srcnn_y_tiled(y_u8, weights, mesh: Mesh):
    """SRCNN an upscaled Y batch ``[B, H, W]`` sharded over a device mesh.

    ``B`` shards over the ``data`` axis, rows over ``row``.  ``B`` and ``H``
    must divide by the respective mesh axis sizes (use
    :func:`upscale_y_tiled` for arbitrary ``H``).
    """
    ndata, nrow = mesh.shape["data"], mesh.shape["row"]
    b, h, _ = y_u8.shape
    if b % ndata or h % nrow:
        raise ValueError(f"batch {b} / height {h} not divisible by mesh "
                         f"{ndata}x{nrow}")
    y = jax.device_put(y_u8, NamedSharding(mesh, P("data", "row", None)))
    return _tiled_call(y, weights, mesh)


def upscale_y_tiled(y_u8, weights, mesh: Mesh):
    """Like :func:`srcnn_y_tiled` but pads H to a tile multiple and crops.

    Bottom padding uses replicate rows, which are *identical* to conv1's
    input-level clamp, so every f2 feature row up to the real edge is exact.
    Only conv3's feature-level clamp differs: the last 2 real output rows
    see computed (not clamped) f2 pad rows.  Those 2 rows are recomputed
    monolithically from a 16-row bottom strip and patched in, keeping the
    whole result bit-exact.
    """
    import numpy as np

    from ..ops.srcnn import srcnn_y

    nrow = mesh.shape["row"]
    y = np.asarray(y_u8)
    squeeze = y.ndim == 2
    if squeeze:
        y = y[None]
    b, h, w = y.shape
    hpad = (-h) % nrow
    yp = y
    if hpad:
        yp = np.concatenate([y, np.repeat(y[:, -1:, :], hpad, axis=1)], axis=1)
    ndata = mesh.shape["data"]
    bpad = (-b) % ndata
    if bpad:
        yp = np.concatenate([yp, yp[:bpad]], axis=0)
    out = np.array(srcnn_y_tiled(yp, weights, mesh))[:b, :h, :]
    if hpad:
        strip = min(h, 16)
        fix = np.asarray(srcnn_y(y[:, h - strip:, :], weights))
        n_bad = min(2, h)
        out[:, h - n_bad:, :] = fix[:, strip - n_bad:, :]
    return out[0] if squeeze else out
