"""Fused color-convert + bicubic-upscale Pallas kernel (the pre-pass).

The e2e profile (KERNEL_NOTES round 2f) shows the non-conv span spread
across ~15 small XLA fusions — dense hpass matmul, color descale chains,
vpass phase slices, u8 interleaves — each writing a full plane to HBM.
This kernel runs the whole pre-pass (reference src/srcnn.cpp:509 cvtColor
+ :570-583 per-channel bicubic) in ONE pass over output tiles: DMA the
BGR u8 slab once, color-convert, horizontal+vertical phase-form bicubic,
round/clamp, interleave — all in VMEM — and write the upscaled YCrCb u8
tile once.  HBM traffic per frame drops to one low-res read + one
high-res write (~3 ms of v5e bandwidth at batch-32 1080p vs ~19 ms for
the fusion chain).

Numerics are IDENTICAL to the exact engines (bit-for-bit):

* color: the same 14-bit fixed-point arithmetic in exact f32
  (ops/color._descale_f32 — every intermediate an exact integer in f32);
* horizontal pass: the lane-phase form's contiguous slices x int-valued
  f32 coefficients — every product < 2^19 and 4-term sum < 2^22, exact
  in f32 in ANY order (ops/resize._hphase_plan);
* vertical pass: the phase form's strided row slices with OpenCV's
  right-to-left separate mul/add roundings, the identical op sequence as
  ops/resize._vpass (ops/resize._vphase_plan);
* replicate padding: input-edge replication commutes with the per-row/
  per-column passes, so padding the INPUT plane reproduces the engines'
  row/column padding of intermediates.

Bit-identity caveat (CPU ONLY): XLA:CPU may contract the vertical pass's
mul+add into an FMA (single rounding) DEPENDING ON PROGRAM CONTEXT — the
same `_vpass` sequence rounds differently in different programs (verified:
an exact-155.5 pixel computes as 155.49998 in one jit and 155.5 in
another; `lax.optimization_barrier` does not stop it).  So on the CPU
backend a handful of exact-boundary pixels (~1e-5 of pixels) can differ
by 1 LSB between this kernel and the XLA engine.  On TPU neither XLA nor
Mosaic contracts f32 mul+add, and the engine itself is verified bit-exact
vs OpenCV on chip (EVAL.md); the on-chip gate for this kernel is
bit-identity (tests/test_tpu.py).

Scope: geometries where both phase plans exist with source step 1 —
i.e. integer upscales (x2 is every BASELINE config).  The wrapper
returns None otherwise and the caller falls back to the XLA engines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .color import _B2Y, _CB2G, _CB2B, _CR2G, _CR2R, _DELTA, _G2Y, _R2CR, \
    _B2CB, _R2Y, _descale_f32
from .resize import _hphase_plan, _vphase_plan

__all__ = ["pre_upscale_fused"]


def _kernel(bgr_ref, *refs, tih: int, tiw: int,
            svp: int, swp: int, pv: int, ph: int, vb, vc, hb, hc,
            rowinter: str = "kernel", ablate: frozenset = frozenset()):
    """``ph`` (3, pv*tih, tiw) phase tiles from a (3, svp, swp) BGR slab.

    Output phase ``p`` holds output columns ``p, p+ph, p+2*ph, ...`` — the
    caller lane-interleaves the phase planes (a Mosaic ``tpu.reshape`` of
    an interleave into the lane axis is unsupported, so the interleave
    happens outside the kernel; it is a bandwidth-trivial u8 relayout).

    ``rowinter`` picks where the pv VERTICAL phases interleave into output
    rows: ``"kernel"`` does the stack+reshape relayout in-kernel (one
    sublane interleave of the whole f32 tile); ``"xla"`` writes the phases
    CONTIGUOUSLY (rows [q*tih, (q+1)*tih) of each tile block hold phase q)
    and the caller de-interleaves outside — the round-4 preablate run
    attributed ~15% of kernel time to the in-kernel relayout, while the
    XLA-side u8 relayout fuses with the lane interleave it already does.

    ``ablate`` (profiling only, never set on the production path) skips
    named stages so their cost can be attributed on-chip by differencing:
    "color" feeds raw casts, "h"/"v" replace that pass's arithmetic with a
    same-shape slice, "round" skips round+clip, "inter" replaces the
    vertical-phase interleave with a plain concat (same bytes, contiguous).
    """
    out_refs, (slab, dma_sem) = refs[:ph], refs[ph:]
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    gh, gw = pl.num_programs(1), pl.num_programs(2)
    # double-buffered slab DMA: tile t+1's slab streams in while tile t
    # computes (TPU grids run sequentially per core; scratch persists
    # across steps, so the copy started last step is ready to wait on).
    # Without this the kernel serializes DMA-then-compute per tile and
    # gains nothing over the XLA engine chain (round-3 on-chip ablation:
    # fused-pre gain 0.37 ms vs the ~8 ms the bandwidth math predicts).
    t = (b * gh + i) * gw + j
    total = pl.num_programs(0) * gh * gw
    par = jax.lax.rem(t, 2)

    def _start(tn, slot):
        jn = jax.lax.rem(tn, gw)
        rest = jax.lax.div(tn, gw)
        in_ = jax.lax.rem(rest, gh)
        bn = jax.lax.div(rest, gh)
        pltpu.make_async_copy(
            bgr_ref.at[bn, :, pl.ds(in_ * tih, svp), pl.ds(jn * tiw, swp)],
            slab.at[slot], dma_sem.at[slot]).start()

    @pl.when(t == 0)
    def _():
        _start(t, 0)

    @pl.when(t + 1 < total)
    def _():
        _start(t + 1, jax.lax.rem(t + 1, 2))

    pltpu.make_async_copy(
        bgr_ref.at[b, :, pl.ds(i * tih, svp), pl.ds(j * tiw, swp)],
        slab.at[par], dma_sem.at[par]).wait()
    x = slab[par].astype(jnp.int32).astype(jnp.float32)

    # fixed-point color conversion, exact in f32 (ops/color.py semantics)
    bl, gr, rd = x[0], x[1], x[2]
    if "color" in ablate:
        ycc = jnp.stack([bl, gr, rd], axis=0)
    else:
        y = _descale_f32(bl * _B2Y + gr * _G2Y + rd * _R2Y)
        cr = _descale_f32((rd - y) * _R2CR + _DELTA)
        cb = _descale_f32((bl - y) * _B2CB + _DELTA)
        # clip to the u8 range like bgr2ycrcb_u8_planar (y/cr/cb of valid
        # BGR are already in range; the clip matches the engine exactly
        # anyway)
        ycc = jnp.clip(jnp.stack([y, cr, cb], axis=0), 0.0, 255.0)

    th = pv * tih
    for p in range(ph):
        if "h" in ablate:
            rp = ycc[:, :, 0:tiw]
        else:
            # horizontal phase p: 4 contiguous lane slices x int
            # coefficients (exact integer sums in f32, hplan branch)
            rp = ycc[:, :, hb[p][3]: hb[p][3] + tiw] * jnp.float32(hc[p][3])
            for k in (2, 1, 0):
                rp = ycc[:, :, hb[p][k]: hb[p][k] + tiw] \
                    * jnp.float32(hc[p][k]) + rp          # [3, svp, tiw]
        phases = []
        for q in range(pv):
            if "v" in ablate:
                r2 = rp[:, 0:tih, :]
            else:
                # vertical phase q: OpenCV's right-to-left separate
                # mul/add roundings — identical ops as ops/resize._vpass
                r2 = rp[:, vb[q][3]: vb[q][3] + tih, :] * vc[q][3]
                for k in (2, 1, 0):
                    r2 = rp[:, vb[q][k]: vb[q][k] + tih, :] * vc[q][k] + r2
            phases.append(r2 if "round" in ablate
                          else jnp.clip(jnp.round(r2), 0.0, 255.0))
        if pv == 1:
            col = phases[0]
        elif "inter" in ablate or rowinter == "xla":
            col = jnp.concatenate(phases, axis=1)
        else:
            col = jnp.stack(phases, axis=2).reshape(3, th, tiw)
        # Mosaic has no direct f32->u8 cast; truncate via i32 (col is a
        # clipped non-negative integer-valued f32, so the value is
        # unchanged)
        out_refs[p][0] = col.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("tih", "tiw", "svp", "swp", "pv", "ph",
                              "vb", "vc", "hb", "hc", "gh", "gw",
                              "rowinter", "ablate"))
def _fused_pre_call(ypad, tih, tiw, svp, swp, pv, ph, vb, vc, hb, hc,
                    gh, gw, rowinter: str = "kernel",
                    ablate: frozenset = frozenset()):
    nb = ypad.shape[0]
    body = functools.partial(
        _kernel, tih=tih, tiw=tiw, svp=svp, swp=swp, pv=pv, ph=ph,
        vb=vb, vc=vc, hb=hb, hc=hc, rowinter=rowinter, ablate=ablate)
    phase_planes = pl.pallas_call(
        body,
        grid=(nb, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(
            (1, 3, pv * tih, tiw), lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM)] * ph,
        out_shape=[jax.ShapeDtypeStruct(
            (nb, 3, gh * pv * tih, gw * tiw), jnp.uint8)] * ph,
        scratch_shapes=[
            pltpu.VMEM((2, 3, svp, swp), ypad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(ypad)
    oh_pad, ow_col = gh * pv * tih, gw * tiw
    if rowinter == "xla" and pv > 1 and not ablate:
        # de-interleave the contiguous row phases per tile block: block
        # rows [q*tih + r] hold output row [pv*r + q] — a u8 relayout XLA
        # fuses with the lane interleave below
        phase_planes = [
            jnp.transpose(p.reshape(nb, 3, gh, pv, tih, ow_col),
                          (0, 1, 2, 4, 3, 5)).reshape(
                nb, 3, oh_pad, ow_col)
            for p in phase_planes]
    if ph == 1:
        return phase_planes[0]
    # lane-interleave the phase planes (phase p owns output cols p::ph)
    return jnp.stack(phase_planes, axis=-1).reshape(
        nb, 3, oh_pad, ow_col * ph)


def _plan_static(plan_bases, plan_coefs):
    """Hashable (tuple-of-tuples) bases/coefs for static kernel params."""
    bases = tuple(tuple(int(v) for v in row) for row in plan_bases)
    coefs = tuple(tuple(float(np.float32(v)) for v in row)
                  for row in plan_coefs)
    return bases, coefs


def _pre_statics(oh: int, ih: int, ow: int, iw: int):
    """Static phase tables for the fused pre-pass, or None.

    ``None`` when the geometry has no step-1 phase plan on either axis
    (callers fall back to the XLA engines).  The tables are hashable so
    they ride jit static args; they are GLOBAL-geometry tables — a
    row-sharded caller may reuse them per local block because the plans
    are bitwise-periodic and the local phase aligns whenever each
    device's output rows are a multiple of ``pv`` (see
    parallel/tiling.pre_upscale_fused_rows).
    """
    vplan = _vphase_plan(oh, ih)
    hplan = _hphase_plan(ow, iw)
    if vplan is None or hplan is None or vplan[1] != 1:
        return None
    pv, _, top, _, vb_l, vc_l = vplan
    ph, left, _, hb_l, hc_l = hplan
    vb, vc = _plan_static(vb_l, vc_l)
    hb, hc = _plan_static(hb_l, hc_l)
    return pv, top, ph, left, vb, vc, hb, hc


def _apply_fused_pre(x, oh: int, ow: int, statics, rows_above: int = 0,
                     cols_left: int = 0,
                     tile: tuple[int, int] | None = None,
                     rowinter: str = "xla",
                     ablate: frozenset = frozenset()):
    """Run the kernel over ``x [B, 3, rows, W]`` -> YCrCb ``[B, 3, oh, ow]``.

    ``rows_above`` rows of REAL vertical context sit above the first owned
    input row (a sharded caller passes halo rows there; the monolith
    passes 0).  ``cols_left`` is the column-axis counterpart (a
    column-sharded caller passes its left halo width).  Everything the
    slab windows need beyond the provided rows/cols is edge-padded:
    ``top - rows_above`` rows above and ``left - cols_left`` cols on the
    left (replicate == the reference clamp at a true edge; a sharded
    caller provides the full ``top``/``left`` so nothing is invented),
    plus alignment/overshoot slack below and on the right.  Trailing
    slack rows/cols are read by the last tiles' slabs but contribute only
    to outputs that are cropped away.
    """
    pv, top, ph, left, vb, vc, hb, hc = statics
    rows, iw = x.shape[-2:]
    # tile size: tih rows / tiw lanes PER PHASE (output tile pv*tih x
    # ph*tiw); shrink for short/narrow planes.  ``tile`` overrides for
    # on-chip sweeps (benchmarks/prepost_ab.py).
    if tile is not None:
        tih, tiw = tile
    else:
        # round-4 on-chip sweep (benchmarks/prepost_ab.py, KERNEL_NOTES
        # 4c): tiw must round UP so a phase's full width rides ONE block
        # when it fits — the round-3 policy's round-DOWN split 960 cols
        # into a full block plus a 64-useful-col runt and cost ~30%
        # (16.93 vs 12.96 ms at the bench geometry).  Taller tiles
        # measured flat (32/48/64 x 1024 within 0.5%), so tih stays 32.
        tih = max(8, min(32, (oh // pv) // 8 * 8))
        tiw = max(128, min(1024, -(-(ow // ph) // 128) * 128))
    gh = -(-oh // (pv * tih))
    gw = -(-ow // (ph * tiw))
    max_vb = max(v for row in vb for v in row)
    max_hb = max(v for row in hb for v in row)
    svp = -(-(max_vb + tih) // 8) * 8
    swp = -(-(max_hb + tiw) // 128) * 128
    # pad the input so every tile's slab window exists: slab (i, j) reads
    # rows [i*tih, i*tih + svp), cols [j*tiw, j*tiw + swp) of the padded
    # plane; edge mode realizes the replicate border (and keeps the
    # overshoot rows/cols of the last tiles benign — their outputs crop)
    need_r = (gh - 1) * tih + svp
    need_c = (gw - 1) * tiw + swp
    ypad = jnp.pad(
        x, ((0, 0), (0, 0),
            (top - rows_above, max(0, need_r - (top - rows_above) - rows)),
            (left - cols_left,
             max(0, need_c - (left - cols_left) - iw))),
        mode="edge")
    return _fused_pre_call(ypad, tih, tiw, svp, swp, pv, ph, vb, vc, hb, hc,
                           gh, gw, rowinter=rowinter,
                           ablate=ablate)[:, :, :oh, :ow]


def pre_upscale_fused(bgr_p, out_hw: tuple[int, int]):
    """Planar BGR u8 ``[B, 3, H, W]`` -> upscaled YCrCb u8 ``[B, 3, oh, ow]``.

    Fused color+bicubic pre-pass, bit-identical to
    ``resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)``.  Returns None
    when the geometry has no step-1 phase plan on either axis (the caller
    falls back to the XLA engines).
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    ih, iw = bgr_p.shape[-2:]
    if oh < 8 or ow < 128:
        return None                      # tiny planes: not worth a kernel
    statics = _pre_statics(oh, ih, ow, iw)
    if statics is None:
        return None
    squeeze = bgr_p.ndim == 3
    x = bgr_p[None] if squeeze else bgr_p
    out = _apply_fused_pre(x, oh, ow, statics)
    return out[0] if squeeze else out
