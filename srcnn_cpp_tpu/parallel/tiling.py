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
    return _halo_exchange_rows_asym(y, halo, halo, axis_name)


def _clamp_feature_edges(f2, axis: int, axis_name: str):
    """Replace the 2 outermost feature rows/cols with clamped copies at the
    true image edges (reference conv3 padding semantics), pass through
    neighbor-derived values elsewhere.  ``axis`` is the spatial dim of the
    NHWC tensor (-3 rows, -2 cols)."""
    n = lax.axis_size(axis_name)

    def take(i, k=1):
        sl = [slice(None)] * f2.ndim
        sl[axis] = slice(i, i + k) if i >= 0 else slice(i, (i + k) or None)
        return f2[tuple(sl)]

    lead_clamped = jnp.repeat(take(2), 2, axis=axis)
    tail_clamped = jnp.repeat(take(-3), 2, axis=axis)
    if n == 1:
        lead, tail = lead_clamped, tail_clamped
    else:
        idx = lax.axis_index(axis_name)
        lead = jnp.where(idx == 0, lead_clamped, take(0, 2))
        tail = jnp.where(idx == n - 1, tail_clamped, take(-2, 2))
    mid_sl = [slice(None)] * f2.ndim
    mid_sl[axis] = slice(2, -2)
    return jnp.concatenate([lead, f2[tuple(mid_sl)], tail], axis=axis)


def _srcnn_rows_f32(y_block, weights, axis_name: str = "row"):
    """Per-device forward on a row block ``[B, Ht, W]`` -> f32 ``[B, Ht, W]``.

    One 6-row input halo exchange covers conv1's 4 and conv3's 2 — but at
    the *true* image edges conv3's padding must be clamped copies of f2's
    edge rows (feature-level replication, srcnn.cpp:200-210), not features
    computed from virtually-extended input; those two rows are overwritten
    accordingly on the first/last device.
    """
    ext = _halo_exchange_rows(y_block, HALO, axis_name)        # [B, Ht+12, W]
    f2 = conv12_f32(ext[..., None], weights, pad_h=False)       # [B, Ht+4, W, 32]
    f2 = _clamp_feature_edges(f2, -3, axis_name)
    out = conv3_f32(f2, weights, pad_h=False)                   # [B, Ht, W, 1]
    return out[..., 0]


def _srcnn_rows_fused(y_block, weights, axis_name: str = "row"):
    """Per-device FUSED-KERNEL forward on a row block ``[B, Ht, W]`` -> u8.

    The production multi-chip composition: each device runs the Pallas
    kernel (:func:`..ops.pallas_srcnn.srcnn_y_fused`) on its halo-extended
    tile.  Correctness decomposition:

    * interior seams: the 6-row halos carry REAL neighbor rows, so the
      kernel's virtual extension never reaches a kept row — bit-identical
      to the monolithic kernel;
    * column edges: true image edges on every tile (rows-only sharding);
      the kernel's own strip/corner machinery supplies the reference
      feature-column clamp;
    * global top/bottom 2 rows (first/last device only): the reference
      needs conv3's feature-ROW clamp there, which the extended-tile run
      replaces with virtual extension over the replicate halo — those rows
      are recomputed from an 8-row strip with the split-precision XLA path
      and selected by ``axis_index`` masks (both-dim edge pad, so the 2x2
      global corners carry the row+column clamp).

    Inference-only (u8 out); the differentiable path stays
    :func:`_srcnn_rows_f32`.
    """
    from ..ops.pallas_srcnn import srcnn_y_fused
    from ..ops.srcnn import srcnn_y_split

    ext = _halo_exchange_rows(y_block, HALO, axis_name)    # [B, Ht+12, W]
    out = srcnn_y_fused(ext, weights)[:, HALO:-HALO, :]
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    cs = min(8, y_block.shape[1])
    tf = srcnn_y_split(y_block[:, :cs, :], weights)[:, :2, :]
    bf = srcnn_y_split(y_block[:, -cs:, :], weights)[:, cs - 2:, :]
    out = out.at[:, :2, :].set(jnp.where(idx == 0, tf, out[:, :2, :]))
    out = out.at[:, -2:, :].set(
        jnp.where(idx == n - 1, bf, out[:, -2:, :]))
    return out


def _srcnn_tile2d_fused(y_block, weights, row_axis: str = "row",
                        col_axis: str = "col"):
    """Per-device FUSED-KERNEL forward on a 2-D tile ``[B, Ht, Wt]`` -> u8.

    Extends :func:`_srcnn_rows_fused` to (row x col) meshes.  Correctness
    decomposition:

    * halos are exchanged on BOTH spatial axes (6 px each: conv1's 4 +
      conv3's 2), then the kernel runs on the extended tile and the result
      is cropped by 6.  Every kept pixel's full receptive field (f2 rows/
      cols +-2, each reaching input +-4, total +-6) lies inside the
      extended tile, and the kernel's own edge machinery (in-kernel row
      clamp, column-strip fix) only touches the outermost 2 rows/cols of
      the EXTENDED tile — cropped away.  So interior seams (and everything
      else except true image edges) are bit-identical to the monolithic
      kernel with no per-seam special cases at all;
    * true image edges still need the reference's conv3 FEATURE-level
      clamp (srcnn.cpp:200-210), which virtual extension over a replicate
      halo does not reproduce: the outermost 2 rows (first/last row
      device), 2 columns (first/last col device) and 2x2 global corners
      are recomputed with the split-precision XLA path on 8-deep strips
      cut from the singly-extended tiles (so the strip recompute itself
      sees real neighbor context on the other axis), then selected in by
      ``axis_index`` masks.

    Requires tile dims >= 8 (strip depth).  Inference-only (u8 out); the
    differentiable path stays :func:`_srcnn_tile2d_f32`.
    """
    from ..ops.pallas_srcnn import _transpose_weights, srcnn_y_fused
    from ..ops.srcnn import srcnn_y_split

    nr, nc = lax.axis_size(row_axis), lax.axis_size(col_axis)
    ri, ci = lax.axis_index(row_axis), lax.axis_index(col_axis)
    ext_c = _halo_exchange_cols(y_block, HALO, col_axis)   # [B, Ht, Wt+12]
    ext = _halo_exchange_rows(ext_c, HALO, row_axis)       # [B, Ht+12, Wt+12]
    out = srcnn_y_fused(ext, weights)[:, HALO:-HALO, HALO:-HALO]

    b, ht, wt = y_block.shape
    m = 2
    # top/bottom rows: strips from the column-extended tile (real column
    # context), reference row semantics from the strip's own edge clamp
    tf = srcnn_y_split(ext_c[:, :8, :], weights)[:, :m, HALO:-HALO]
    bf = srcnn_y_split(ext_c[:, -8:, :], weights)[:, 8 - m:, HALO:-HALO]
    out = out.at[:, :m, :].set(jnp.where(ri == 0, tf, out[:, :m, :]))
    out = out.at[:, -m:, :].set(jnp.where(ri == nr - 1, bf, out[:, -m:, :]))

    # left/right columns: transposed strips from the row-extended tile
    # (corr2d(x^T, k^T) == corr2d(x, k)^T; conv2 is 1x1).  The row exchange
    # acts per column, so ext's interior column slice IS the row-extended
    # tile bitwise — no second ppermute pair needed.
    ext_r = ext[:, :, HALO:-HALO]                          # [B, Ht+12, Wt]
    wt_w = _transpose_weights(weights)
    lcT = srcnn_y_split(jnp.swapaxes(ext_r[:, :, :8], 1, 2), wt_w)
    rcT = srcnn_y_split(jnp.swapaxes(ext_r[:, :, -8:], 1, 2), wt_w)
    lc = jnp.swapaxes(lcT[:, :m, HALO:-HALO], 1, 2)        # [B, Ht, m]
    rc = jnp.swapaxes(rcT[:, 8 - m:, HALO:-HALO], 1, 2)
    out = out.at[:, :, :m].set(jnp.where(ci == 0, lc, out[:, :, :m]))
    out = out.at[:, :, -m:].set(jnp.where(ci == nc - 1, rc, out[:, :, -m:]))

    # global 2x2 corners: both-dim feature clamp via 8x8 patches
    pat = jnp.stack([y_block[:, :8, :8], y_block[:, :8, -8:],
                     y_block[:, -8:, :8], y_block[:, -8:, -8:]], axis=1)
    co = srcnn_y_split(pat.reshape(4 * b, 8, 8), weights).reshape(b, 4, 8, 8)
    first_r, last_r = ri == 0, ri == nr - 1
    first_c, last_c = ci == 0, ci == nc - 1
    out = out.at[:, :m, :m].set(
        jnp.where(first_r & first_c, co[:, 0, :m, :m], out[:, :m, :m]))
    out = out.at[:, :m, -m:].set(
        jnp.where(first_r & last_c, co[:, 1, :m, 8 - m:], out[:, :m, -m:]))
    out = out.at[:, -m:, :m].set(
        jnp.where(last_r & first_c, co[:, 2, 8 - m:, :m], out[:, -m:, :m]))
    out = out.at[:, -m:, -m:].set(
        jnp.where(last_r & last_c, co[:, 3, 8 - m:, 8 - m:],
                  out[:, -m:, -m:]))
    return out


def _halo_exchange_cols(y, halo: int, axis_name: str = "col"):
    """Column analogue of :func:`_halo_exchange_rows` (lane-dim halos)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        edge_l = jnp.repeat(y[..., :, :1], halo, axis=-1)
        edge_r = jnp.repeat(y[..., :, -1:], halo, axis=-1)
        return jnp.concatenate([edge_l, y, edge_r], axis=-1)
    idx = lax.axis_index(axis_name)
    right = [(i, i + 1) for i in range(n - 1)]
    left = [(i + 1, i) for i in range(n - 1)]
    recv_l = lax.ppermute(y[..., :, -halo:], axis_name, right)
    recv_r = lax.ppermute(y[..., :, :halo], axis_name, left)
    edge_l = jnp.repeat(y[..., :, :1], halo, axis=-1)
    edge_r = jnp.repeat(y[..., :, -1:], halo, axis=-1)
    lead = jnp.where(idx == 0, edge_l, recv_l)
    tail = jnp.where(idx == n - 1, edge_r, recv_r)
    return jnp.concatenate([lead, y, tail], axis=-1)


def _srcnn_tile2d_f32(y_block, weights, row_axis: str = "row",
                      col_axis: str = "col"):
    """Per-device forward on a 2-D tile ``[B, Ht, Wt]`` (row x col mesh).

    Halo exchange on both spatial axes; conv runs VALID in both; conv3's
    feature-level clamp applied at true image edges on both axes.
    """
    ext = _halo_exchange_rows(y_block, HALO, row_axis)
    ext = _halo_exchange_cols(ext, HALO, col_axis)     # [B, Ht+12, Wt+12]
    f2 = conv12_f32(ext[..., None], weights, pad_h=False, pad_w=False)
    f2 = _clamp_feature_edges(f2, -3, row_axis)
    f2 = _clamp_feature_edges(f2, -2, col_axis)
    out = conv3_f32(f2, weights, pad_h=False, pad_w=False)
    return out[..., 0]


@partial(jax.jit, static_argnames=("mesh", "kernel"))
def _tiled_call(y, weights, mesh: Mesh, kernel: str = "xla"):
    if "col" in mesh.shape and mesh.shape["col"] > 1:
        if kernel == "pallas":
            fn = shard_map(
                lambda w, x: _srcnn_tile2d_fused(x, w),
                mesh=mesh,
                in_specs=(P(), P("data", "row", "col")),
                out_specs=P("data", "row", "col"),
                # pallas_call's out_shape carries no varying-mesh-axes
                # info, so the vma checker cannot see through the kernel
                check_vma=False,
            )
        else:
            fn = shard_map(
                lambda w, x: quantize_trunc_u8(_srcnn_tile2d_f32(x, w)),
                mesh=mesh,
                in_specs=(P(), P("data", "row", "col")),
                out_specs=P("data", "row", "col"),
            )
    elif kernel == "pallas":
        fn = shard_map(
            lambda w, x: _srcnn_rows_fused(x, w),
            mesh=mesh,
            in_specs=(P(), P("data", "row", None)),
            out_specs=P("data", "row", None),
            # pallas_call's out_shape carries no varying-mesh-axes info, so
            # the vma checker cannot see through the kernel
            check_vma=False,
        )
    else:
        fn = shard_map(
            lambda w, x: quantize_trunc_u8(_srcnn_rows_f32(x, w)),
            mesh=mesh,
            in_specs=(P(), P("data", "row", None)),
            out_specs=P("data", "row", None),
        )
    return fn(weights, y)


def srcnn_y_tiled(y_u8, weights, mesh: Mesh, kernel: str = "xla"):
    """SRCNN an upscaled Y batch ``[B, H, W]`` sharded over a device mesh.

    ``B`` shards over the ``data`` axis, rows over ``row`` and (when the
    mesh has one) columns over ``col`` — 2-D spatial tiling with halo
    exchange on both axes.  Dims must divide by the mesh axis sizes (use
    :func:`upscale_y_tiled` for arbitrary ``H``).  ``kernel="pallas"``
    runs the fused single-pass kernel per device (inference; rows-only
    meshes via :func:`_srcnn_rows_fused`, (row x col) meshes via
    :func:`_srcnn_tile2d_fused` — tiles must be at least 8x8 there for
    the true-edge strip recompute).
    """
    ndata, nrow = mesh.shape["data"], mesh.shape["row"]
    ncol = mesh.shape.get("col", 1)
    b, h, w = y_u8.shape
    if b % ndata or h % nrow or w % ncol:
        raise ValueError(f"batch {b} / height {h} / width {w} not divisible "
                         f"by mesh {ndata}x{nrow}x{ncol}")
    if kernel == "pallas" and ncol > 1 and (h // nrow < 8 or w // ncol < 8):
        raise ValueError(f"kernel='pallas' on a 2-D mesh needs tiles >= 8x8 "
                         f"(got {h // nrow}x{w // ncol})")
    spec = P("data", "row", "col" if ncol > 1 else None)
    y = jax.device_put(y_u8, NamedSharding(mesh, spec))
    return _tiled_call(y, weights, mesh, kernel)


def upscale_y_tiled(y_u8, weights, mesh: Mesh, kernel: str = "xla"):
    """Like :func:`srcnn_y_tiled` but pads H to a tile multiple and crops.

    Bottom padding uses replicate rows, which are *identical* to conv1's
    input-level clamp, so every f2 feature row up to the real edge is exact.
    Only conv3's feature-level clamp differs: the last 2 real output rows
    see computed (not clamped) f2 pad rows.  Those 2 rows are recomputed
    monolithically from a 16-row bottom strip and patched in, keeping the
    whole result bit-exact.

    All padding/cropping/patching is device-side jnp (no host round-trip):
    a jax.Array input stays on device end to end.  Returns a jax.Array.
    """
    from ..ops.srcnn import srcnn_y

    nrow = mesh.shape["row"]
    y = jnp.asarray(y_u8)
    squeeze = y.ndim == 2
    if squeeze:
        y = y[None]
    b, h, w = y.shape
    hpad = (-h) % nrow
    yp = y
    if hpad:
        yp = jnp.concatenate(
            [y, jnp.repeat(y[:, -1:, :], hpad, axis=1)], axis=1)
    ndata = mesh.shape["data"]
    bpad = (-b) % ndata
    if bpad:
        yp = jnp.concatenate([yp, yp[:bpad]], axis=0)
    out = srcnn_y_tiled(yp, weights, mesh, kernel)[:b, :h, :]
    if hpad:
        strip = min(h, 16)
        fix = srcnn_y(y[:, h - strip:, :], weights)
        n_bad = min(2, h)
        out = out.at[:, h - n_bad:, :].set(fix[:, strip - n_bad:, :])
    return out[0] if squeeze else out


def _halo_exchange_rows_asym(y, top: int, bot: int, axis_name: str = "row"):
    """Asymmetric row halo: ``top`` rows from above, ``bot`` from below.

    Neighbor rows at interior seams via ppermute, replicate rows at true
    edges.  Independent per-side counts because the bicubic pre-pass needs
    ``top=1`` / ``bot=2``-shaped halos (tap window asymmetry);
    :func:`_halo_exchange_rows` is the symmetric special case.
    """
    assert top >= 1 and bot >= 1, (top, bot)   # -top: would misslice at 0
    n = lax.axis_size(axis_name)
    edge_t = jnp.repeat(y[..., :1, :], top, axis=-2)
    edge_b = jnp.repeat(y[..., -1:, :], bot, axis=-2)
    if n == 1:
        return jnp.concatenate([edge_t, y, edge_b], axis=-2)
    idx = lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    recv_top = lax.ppermute(y[..., -top:, :], axis_name, down)
    recv_bot = lax.ppermute(y[..., :bot, :], axis_name, up)
    lead = jnp.where(idx == 0, edge_t, recv_top)
    tail = jnp.where(idx == n - 1, edge_b, recv_bot)
    return jnp.concatenate([lead, y, tail], axis=-2)


def _halo_exchange_cols_asym(y, lft: int, rgt: int, axis_name: str = "col"):
    """Asymmetric column halo: ``lft`` cols from the left neighbor, ``rgt``
    from the right; replicate cols at the true image edges (the lane-axis
    twin of :func:`_halo_exchange_rows_asym`)."""
    assert lft >= 1 and rgt >= 1, (lft, rgt)
    n = lax.axis_size(axis_name)
    edge_l = jnp.repeat(y[..., :1], lft, axis=-1)
    edge_r = jnp.repeat(y[..., -1:], rgt, axis=-1)
    if n == 1:
        return jnp.concatenate([edge_l, y, edge_r], axis=-1)
    idx = lax.axis_index(axis_name)
    right = [(i, i + 1) for i in range(n - 1)]
    left = [(i + 1, i) for i in range(n - 1)]
    recv_l = lax.ppermute(y[..., -lft:], axis_name, right)
    recv_r = lax.ppermute(y[..., :rgt], axis_name, left)
    lead = jnp.where(idx == 0, edge_l, recv_l)
    tail = jnp.where(idx == n - 1, edge_r, recv_r)
    return jnp.concatenate([lead, y, tail], axis=-1)


@partial(jax.jit, static_argnames=("mesh", "statics", "oh_loc", "ow_loc",
                                   "top", "bot", "lft", "rgt", "batch_axis"))
def _pre_fused_grid_call(x, mesh, statics, oh_loc, ow_loc, top, bot,
                         lft, rgt, batch_axis, vcf=None, hcf=None):
    """Sharded fused pre-pass: rows over ``row``, cols over ``col`` (when
    ``lft`` is nonzero), one Pallas kernel per device block.

    ``vcf``/``hcf`` are the GENERALIZED plan's per-output coefficient
    planes (ops/pallas_resize._pre_plans); they shard alongside the
    output — vcf (pv, 4, oh/pv) over ``row``, hcf (ph, 4, ow/ph) over
    ``col`` — because every device's first output row/col is a phase-
    period multiple, so its local slice is exactly its rows'/cols'
    coefficients.
    """
    spec = P(batch_axis, None, "row", "col" if lft else None)
    in_specs = [spec]
    args = [x]
    if vcf is not None:
        in_specs.append(P(None, None, "row"))
        args.append(vcf)
    if hcf is not None:
        in_specs.append(P(None, None, "col" if lft else None))
        args.append(hcf)

    def fn(blk, *coefs):
        from ..ops.pallas_resize import _apply_fused_pre

        it = iter(coefs)
        v = next(it) if vcf is not None else None
        hh = next(it) if hcf is not None else None
        ext = _halo_exchange_rows_asym(blk, top, bot)   # [b, 3, Hi+t+b, W]
        if lft:
            ext = _halo_exchange_cols_asym(ext, lft, rgt)
        return _apply_fused_pre(ext, oh_loc, ow_loc, statics,
                                rows_above=top, cols_left=lft,
                                vcf=v, hcf=hh)

    return shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=spec,
        # pallas_call's out_shape carries no varying-mesh-axes info, so
        # the vma checker cannot see through the kernel
        check_vma=False,
    )(*args)


def pre_upscale_fused_rows(bgr_p, out_hw: tuple[int, int], mesh: Mesh):
    """Row- (and optionally column-) sharded fused bicubic pre-pass.

    Planar BGR u8 ``[B, 3, H, W]`` (or ``[3, H, W]``) -> upscaled YCrCb u8,
    batch over ``data`` and input/output rows over ``row`` — each device
    runs ONE Pallas pre-pass kernel (ops/pallas_resize.py) on its row
    block after an asymmetric ppermute halo of the LOW-RES input (``top``
    rows from above, ``max_tap - top`` from below: the full vertical
    bicubic tap window).  Per-device output rows are a multiple of the
    vertical phase period ``pv`` (guaranteed when ``row`` divides H, since
    pv divides the integer scale), so every device evaluates the same
    bitwise-periodic global phase plan at its own offset: the stitched
    plane is the monolithic kernel's output exactly.

    On a 2-D ``(row, col)`` mesh, columns shard the same way: an
    asymmetric LANE-axis ppermute halo (``left`` cols from the left
    neighbor, ``max_htap - left`` from the right) and a per-device kernel
    whose horizontal phase plan aligns because ``ph`` divides the local
    output cols (round-4 implementation of the round-3 verdict item; the
    S=1 plan gives ``ow == ph*iw``, so ``col | iw`` suffices).

    Returns None when no step<=4 phase plan exists or the mesh does not
    divide the geometry (callers fall back to the GSPMD-sharded XLA
    engine).  GENERALIZED coefficient plans (non-power-of-2 scales past
    OpenCV's f32 drift boundary, ops/pallas_resize._pre_plans) are
    supported by sharding the per-output coefficient planes alongside
    the rows/cols.  S>=2 PARITY plans (x1.5: S=2; x1.25/x0.75: S=4)
    shard too (round 5): the parity deinterleave inside the kernel
    wrapper is purely LOCAL — tap values depend only on local padded
    coordinates, which align with the global plan whenever each device's
    input/output blocks keep the plan's exact row ratio
    (``ih_loc * pv == oh_loc * sv``, phases aligned by
    ``oh_loc % pv == 0``) — so no per-device quadrant reassignment is
    needed at all, only the S-generalized halo widths
    (``bot = max_tap - top - (sv - 1)``: the last kept output block's
    deepest tap).  The semantic counterpart of the reference's
    per-channel OpenCV resize (src/srcnn.cpp:570-583), sharded.
    """
    import jax.numpy as jnp

    from ..ops.pallas_resize import _pre_plans

    oh, ow = int(out_hw[0]), int(out_hw[1])
    squeeze = bgr_p.ndim == 3
    x = bgr_p[None] if squeeze else bgr_p
    b, _, ih, iw = x.shape
    nrow = mesh.shape["row"]
    ndata = mesh.shape["data"]
    ncol = mesh.shape.get("col", 1)
    if ih % nrow or oh % nrow or oh < 8 * nrow or ow < 128 * ncol:
        return None
    if iw % ncol or ow % ncol:
        return None
    # batch shards over data only when it divides; replicated otherwise
    # (the single-frame 8K config runs on (data, row) meshes with B == 1)
    batch_axis = "data" if ndata > 1 and b % ndata == 0 else None
    statics, vcf, hcf = _pre_plans(oh, ih, ow, iw)
    if statics is None:
        return None
    pv, top, ph, left = statics[0], statics[1], statics[2], statics[3]
    sv, sh = statics[8:] if len(statics) > 8 else (1, 1)
    # phase alignment + exact per-device row ratio (both required for the
    # local plan to equal the global plan at every device offset)
    if (oh // nrow) % pv or (oh // nrow) * sv != (ih // nrow) * pv:
        return None
    max_vb = max(v for row in statics[4] for v in row)
    bot = max(1, max_vb - top - (sv - 1))
    if top < 1 or max(top, bot) > ih // nrow:
        return None        # degenerate tap window / halo exceeds a block
    lft = rgt = 0
    if ncol > 1:
        if (ow // ncol) % ph or (ow // ncol) * sh != (iw // ncol) * ph:
            return None    # local phase / column-ratio misalignment
        max_hb = max(v for row in statics[6] for v in row)
        lft, rgt = left, max(1, max_hb - left - (sh - 1))
        if lft < 1 or max(lft, rgt) > iw // ncol:
            return None
    # generalized coefficient planes: trim to the exact output extent so
    # the "row"/"col" shardings slice them exactly per device
    if vcf is not None:
        vcf = jnp.asarray(vcf[:, :, :oh // pv])
    if hcf is not None:
        hcf = jnp.asarray(hcf[:, :, :ow // ph])
    sharding = NamedSharding(
        mesh, P(batch_axis, None, "row", "col" if ncol > 1 else None))
    # traced callers (a jitted config step) use a constraint; eager callers
    # place the array directly
    xs = (lax.with_sharding_constraint(x, sharding)
          if isinstance(x, jax.core.Tracer) else jax.device_put(x, sharding))
    out = _pre_fused_grid_call(xs, mesh, statics, oh // nrow, ow // ncol,
                               top, bot, lft, rgt, batch_axis,
                               vcf=vcf, hcf=hcf)
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("mesh", "batch_axis", "col"))
def _merge_fused_rows_call(y_sr, up, mesh, batch_axis, col):
    from ..ops.pallas_merge import merge_ycrcb_to_bgr_fused

    cspec = "col" if col else None
    return shard_map(
        merge_ycrcb_to_bgr_fused, mesh=mesh,
        in_specs=(P(batch_axis, "row", cspec),
                  P(batch_axis, None, "row", cspec)),
        out_specs=P(batch_axis, None, "row", cspec),
        # pallas_call's out_shape carries no varying-mesh-axes info
        check_vma=False,
    )(y_sr, up)


def merge_ycrcb_to_bgr_fused_rows(y_sr, up, mesh: Mesh):
    """Row- (and column-) sharded fused merge post-pass (no halos needed).

    The post-pass is pointwise, so each device simply runs the Pallas
    merge kernel (ops/pallas_merge.py) on its own tile — bit-identical
    to the monolithic kernel by construction; on a ``(row, col)`` mesh
    the columns shard the same way (round 5 — formerly a rows-only
    composition).  ``y_sr [B, oh, ow]`` + ``up [B, 3, oh, ow]`` ->
    planar BGR u8.  Returns None when the mesh does not divide the
    geometry or local tiles are below the kernel minimum.
    """
    b, oh, ow = y_sr.shape
    nrow = mesh.shape["row"]
    ndata = mesh.shape["data"]
    ncol = mesh.shape.get("col", 1)
    if oh % nrow or oh // nrow < 8 or ow % ncol or ow // ncol < 128:
        return None
    batch_axis = "data" if ndata > 1 and b % ndata == 0 else None
    cspec = "col" if ncol > 1 else None
    sharding = NamedSharding(mesh, P(batch_axis, "row", cspec))
    sharding_up = NamedSharding(mesh, P(batch_axis, None, "row", cspec))
    if isinstance(y_sr, jax.core.Tracer) or isinstance(up, jax.core.Tracer):
        y_sr = lax.with_sharding_constraint(y_sr, sharding)
        up = lax.with_sharding_constraint(up, sharding_up)
    else:
        y_sr = jax.device_put(y_sr, sharding)
        up = jax.device_put(up, sharding_up)
    return _merge_fused_rows_call(y_sr, up, mesh, batch_axis, ncol > 1)
