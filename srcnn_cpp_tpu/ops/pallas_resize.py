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

Scope: geometries whose TAP INDICES are periodic with source step
S <= 4 on both axes.  S=1 covers integer upscales (x2 is every BASELINE
config); S>1 plans (x1.5: S=2; x1.25/x0.75: S=4; 2:1/3:1/4:1
downscales: P=1) ride parity-deinterleaved input planes — the padded
input relayouts once into sv*sh quadrant planes so every kernel tap is
again a contiguous slice.  Coefficients may either repeat bitwise
(strict plan: static scalars) or vary per output row/column
(generalized plan: blocked coefficient-plane inputs) — the latter
covers non-power-of-2 integer upscales past output 1536, where OpenCV's
float32 fractional offsets stop repeating bitwise (found via the
round-4 x3 bench: 540p x3 silently fell back to the XLA engines).  The
wrapper returns None for scales with no S<=4 period (e.g. x1.2: S=5)
and the caller falls back to the XLA engines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .color import _B2Y, _B2CB, _DELTA, _G2Y, _R2CR, _R2Y, _descale_f32
from .resize import _hphase_plan, _hphase_plan_s, _phase_idx_plan, \
    _vphase_plan
from .resize_tables import cv_cubic_tables

__all__ = ["pre_upscale_fused"]

#: largest source step admitted by the plan search.  The kernel itself is
#: S-agnostic (quadrant arithmetic is generic in sv/sh); the cap bounds
#: the parity-quadrant count sq = sv*sh (slab scratch and its f32
#: color-converted copy scale with sq — the tile policy shrinks tiw for
#: sq > 4 to stay inside VMEM).  S=4 admits x1.25/x1.75/x0.75 and 3:1/
#: 4:1 downscales; the next useful step (x1.2: S=5 -> sq 25) would need
#: tiles too small to be worth a kernel launch.
_MAX_S = 4


def _kernel(bgr_ref, *refs, tih: int, tiw: int,
            svp: int, swp: int, pv: int, ph: int, vb, vc, hb, hc,
            sv: int = 1, sh: int = 1,
            rowinter: str = "kernel", ablate: frozenset = frozenset()):
    """``ph`` (3, pv*tih, tiw) phase tiles from a (3, svp, swp) BGR slab.

    Output phase ``p`` holds output columns ``p, p+ph, p+2*ph, ...`` — the
    caller lane-interleaves the phase planes (a Mosaic ``tpu.reshape`` of
    an interleave into the lane axis is unsupported, so the interleave
    happens outside the kernel; it is a bandwidth-trivial u8 relayout).

    ``vc``/``hc`` may be ``None`` (GENERALIZED plan, non-power-of-2 integer
    upscales past the float32 boundary — ops/resize._phase_idx_plan): the
    per-output-row/-column coefficient blocks then arrive as extra refs
    ahead of the outputs (vcf (pv, 4, tih, 1), hcf (ph, 4, 1, tiw),
    block-pipelined by index) and broadcast into the same mul/add chains —
    identical values in the identical order, so still bit-exact vs the
    engine's gather form.

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
    vertical-phase interleave with a plain concat (same bytes, contiguous),
    "ych" drops the Y channel from the phase chains (Cr/Cb only, Y output
    duplicated from Cr — the round-5 free-Y bound on the pre→conv fusion
    boundary: what the e2e span becomes if conv got its upscaled Y for
    free).
    """
    if vc is None:
        vcf_ref, refs = refs[0], refs[1:]
    if hc is None:
        hcf_ref, refs = refs[0], refs[1:]
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
    sq = sv * sh          # parity quadrants (1 for the S=1 fast path)

    def _start(tn, slot):
        jn = jax.lax.rem(tn, gw)
        rest = jax.lax.div(tn, gw)
        in_ = jax.lax.rem(rest, gh)
        bn = jax.lax.div(rest, gh)
        if sq == 1:
            pltpu.make_async_copy(
                bgr_ref.at[bn, :, pl.ds(in_ * tih, svp),
                           pl.ds(jn * tiw, swp)],
                slab.at[slot], dma_sem.at[slot]).start()
        else:
            # one DMA per parity quadrant (the deinterleaved planes are
            # disjoint regions of the input array; same window each)
            for qd in range(sq):
                pltpu.make_async_copy(
                    bgr_ref.at[bn, :, qd, pl.ds(in_ * tih, svp),
                               pl.ds(jn * tiw, swp)],
                    slab.at[slot, qd], dma_sem.at[slot, qd]).start()

    @pl.when(t == 0)
    def _():
        _start(t, 0)

    @pl.when(t + 1 < total)
    def _():
        _start(t + 1, jax.lax.rem(t + 1, 2))

    if sq == 1:
        pltpu.make_async_copy(
            bgr_ref.at[b, :, pl.ds(i * tih, svp), pl.ds(j * tiw, swp)],
            slab.at[par], dma_sem.at[par]).wait()
        x = slab[par].astype(jnp.int32).astype(jnp.float32)
        bl, gr, rd = x[0], x[1], x[2]
    else:
        for qd in range(sq):
            pltpu.make_async_copy(
                bgr_ref.at[b, :, qd, pl.ds(i * tih, svp),
                           pl.ds(j * tiw, swp)],
                slab.at[par, qd], dma_sem.at[par, qd]).wait()
        x = slab[par].astype(jnp.int32).astype(jnp.float32)
        bl, gr, rd = x[:, 0], x[:, 1], x[:, 2]   # (sq, svp, swp) each

    # fixed-point color conversion, exact in f32 (ops/color.py semantics)
    if "color" in ablate:
        ycc = jnp.stack([bl, gr, rd], axis=-3)
    else:
        y = _descale_f32(bl * _B2Y + gr * _G2Y + rd * _R2Y)
        cr = _descale_f32((rd - y) * _R2CR + _DELTA)
        cb = _descale_f32((bl - y) * _B2CB + _DELTA)
        # clip to the u8 range like bgr2ycrcb_u8_planar (y/cr/cb of valid
        # BGR are already in range; the clip matches the engine exactly
        # anyway)
        ycc = jnp.clip(jnp.stack([y, cr, cb], axis=-3), 0.0, 255.0)
    # per-quadrant views: quadrant (svi, shi) holds input rows
    # svi::sv x cols shi::sh; for sq == 1 this is just [ycc]
    ycc_q = [ycc] if sq == 1 else [ycc[qd] for qd in range(sq)]
    if "ych" in ablate:
        # free-Y probe: the chains process only Cr/Cb (leading dim 2)
        ycc_q = [c[1:] for c in ycc_q]

    th = pv * tih
    # scalar coefficients when the strict plan holds; per-output-column
    # (1, tiw) / per-output-row (tih, 1) broadcasts from the blocked
    # coefficient refs under the generalized plan — same values, same op
    # order either way
    hcoef = ((lambda p, k: jnp.float32(hc[p][k])) if hc is not None
             else (lambda p, k: hcf_ref[p, k]))
    vcoef = ((lambda q, k: vc[q][k]) if vc is not None
             else (lambda q, k: vcf_ref[q, k]))
    for p in range(ph):
        # horizontal phase p, computed once per VERTICAL parity plane:
        # tap k lives in quadrant (svi, hb%sh) at column hb//sh — always a
        # CONTIGUOUS lane slice (the whole point of the deinterleave)
        rp_par = []
        for svi in range(sv):
            if "h" in ablate:
                rp = ycc_q[svi * sh][:, :, 0:tiw]
            else:
                def hsl(k):
                    qd = svi * sh + hb[p][k] % sh
                    idx = hb[p][k] // sh
                    return ycc_q[qd][:, :, idx: idx + tiw]

                rp = hsl(3) * hcoef(p, 3)
                for k in (2, 1, 0):
                    rp = hsl(k) * hcoef(p, k) + rp        # [3, svp, tiw]
            rp_par.append(rp)
        phases = []
        for q in range(pv):
            if "v" in ablate:
                r2 = rp_par[0][:, 0:tih, :]
            else:
                # vertical phase q: OpenCV's right-to-left separate
                # mul/add roundings — identical ops as ops/resize._vpass;
                # tap k reads the (vb%sv) parity plane at row vb//sv
                def vsl(k):
                    return rp_par[vb[q][k] % sv][
                        :, vb[q][k] // sv: vb[q][k] // sv + tih, :]

                r2 = vsl(3) * vcoef(q, 3)
                for k in (2, 1, 0):
                    r2 = vsl(k) * vcoef(q, k) + r2
            phases.append(r2 if "round" in ablate
                          else jnp.clip(jnp.round(r2), 0.0, 255.0))
        nch = 2 if "ych" in ablate else 3
        if pv == 1:
            col = phases[0]
        elif "inter" in ablate or rowinter == "xla":
            col = jnp.concatenate(phases, axis=1)
        else:
            col = jnp.stack(phases, axis=2).reshape(nch, th, tiw)
        if "ych" in ablate:   # duplicate Cr into the Y slot (cheap slice)
            col = jnp.concatenate([col[:1], col], axis=0)
        # Mosaic has no direct f32->u8 cast; truncate via i32 (col is a
        # clipped non-negative integer-valued f32, so the value is
        # unchanged)
        out_refs[p][0] = col.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("tih", "tiw", "svp", "swp", "pv", "ph",
                              "vb", "vc", "hb", "hc", "gh", "gw",
                              "sv", "sh", "rowinter", "ablate"))
def _fused_pre_call(ypad, tih, tiw, svp, swp, pv, ph, vb, vc, hb, hc,
                    gh, gw, sv: int = 1, sh: int = 1,
                    rowinter: str = "kernel",
                    ablate: frozenset = frozenset(),
                    vcf=None, hcf=None):
    nb = ypad.shape[0]
    sq = sv * sh
    body = functools.partial(
        _kernel, tih=tih, tiw=tiw, svp=svp, swp=swp, pv=pv, ph=ph,
        vb=vb, vc=vc, hb=hb, hc=hc, sv=sv, sh=sh,
        rowinter=rowinter, ablate=ablate)
    # generalized-plan coefficient planes ride blocked in_specs: each grid
    # step sees only its (pv, 4, tih, 1) row / (ph, 4, 1, tiw) col block
    coef_specs, coef_args = [], []
    if vc is None:
        coef_specs.append(pl.BlockSpec((pv, 4, tih, 1),
                                       lambda b, i, j: (0, 0, i, 0)))
        coef_args.append(vcf)
    if hc is None:
        coef_specs.append(pl.BlockSpec((ph, 4, 1, tiw),
                                       lambda b, i, j: (0, 0, 0, j)))
        coef_args.append(hcf)
    phase_planes = pl.pallas_call(
        body,
        grid=(nb, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), *coef_specs],
        out_specs=[pl.BlockSpec(
            (1, 3, pv * tih, tiw), lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM)] * ph,
        out_shape=[jax.ShapeDtypeStruct(
            (nb, 3, gh * pv * tih, gw * tiw), jnp.uint8)] * ph,
        scratch_shapes=[
            pltpu.VMEM((2, 3, svp, swp) if sq == 1
                       else (2, sq, 3, svp, swp), ypad.dtype),
            pltpu.SemaphoreType.DMA((2,) if sq == 1 else (2, sq)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(ypad, *coef_args)
    oh_pad, ow_col = gh * pv * tih, gw * tiw
    # the free-Y probe ("ych") keeps the caller-side relayout so its span
    # is comparable to production; other knockouts emit garbage anyway
    if rowinter == "xla" and pv > 1 and ablate <= {"ych"}:
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
    """STRICT static phase tables for the fused pre-pass, or None.

    ``None`` when the geometry has no bitwise step-1 phase plan on either
    axis.  The tables are hashable so they ride jit static args; they are
    GLOBAL-geometry tables — a row-sharded caller may reuse them per local
    block because the plans are bitwise-periodic and the local phase
    aligns whenever each device's output rows are a multiple of ``pv``
    (see parallel/tiling.pre_upscale_fused_rows).  Sharded callers
    REQUIRE this strict form (per-device coefficient offsets would
    otherwise be needed); the monolithic wrapper also accepts the
    generalized form below.
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


def _phase_coefs(tbl: np.ndarray, P: int) -> np.ndarray:
    """Per-phase coefficient planes: (dst, 4) -> (P, 4, ceil(dst/P))."""
    n = -(-tbl.shape[0] // P)
    out = np.zeros((P, 4, n), np.float32)
    for p in range(P):
        rows = tbl[p::P].astype(np.float32)
        out[p, :, :rows.shape[0]] = rows.T
    return out


def _pre_plans(oh: int, ih: int, ow: int, iw: int):
    """Strict-or-generalized plan: ``(statics, vcf, hcf)`` or 3x None.

    Strict plans (bitwise-periodic coefficients) come back with
    ``vcf``/``hcf`` None and scalar coefficients inside ``statics``.  When
    only the INDICES are periodic (non-power-of-2 integer upscales past
    output 1536, where OpenCV's float32 fractional offsets stop repeating
    bitwise — ops/resize._phase_idx_plan), that axis's ``vc``/``hc``
    static is None and the full per-output coefficient table is returned
    as a (P, 4, n) float32 plane instead, fed to the kernel as a blocked
    input.  Source steps up to ``_MAX_S`` are admitted on both axes
    (x1.5: P=3, S=2; x1.25: P=5, S=4; x0.75: P=3, S=4) — the kernel
    realizes S>1 via parity-deinterleaved input planes, where every tap
    is again a contiguous slice.  Numerics are identical in all
    variants: same coefficient values in the same chain order as the
    engine's gather form.

    Returns the extended statics ``(pv, top, ph, left, vb, vc, hb, hc,
    sv, sh)``; the legacy 8-tuple from :func:`_pre_statics` (implies
    ``sv == sh == 1``) is still accepted everywhere downstream — the
    sharded path keeps using it.
    """
    vplan = _vphase_plan(oh, ih)
    if vplan is not None and vplan[1] <= _MAX_S:
        pv, sv, top, _, vb_l, vc_l = vplan
        vb, vc = _plan_static(vb_l, vc_l)
        vcf = None
    else:
        g = _phase_idx_plan(oh, ih, max_s=_MAX_S)
        if g is None:
            return None, None, None
        pv, sv, top, _, vb_l = g
        vb = tuple(tuple(int(v) for v in row) for row in vb_l)
        vc = None
        _, _, yfc = cv_cubic_tables(oh, ih)
        vcf = _phase_coefs(np.asarray(yfc), pv)
    hplan = _hphase_plan_s(ow, iw, max_s=_MAX_S)
    if hplan is not None:
        ph, sh, left, _, hb_l, hc_l = hplan
        hb, hc = _plan_static(hb_l, hc_l)
        hcf = None
    else:
        g = _phase_idx_plan(ow, iw, max_s=_MAX_S)
        if g is None:
            return None, None, None
        ph, sh, left, _, hb_l = g
        hb = tuple(tuple(int(v) for v in row) for row in hb_l)
        hc = None
        _, xic, _ = cv_cubic_tables(ow, iw)
        hcf = _phase_coefs(np.asarray(xic), ph)
    return (pv, top, ph, left, vb, vc, hb, hc, sv, sh), vcf, hcf


def _apply_fused_pre(x, oh: int, ow: int, statics, rows_above: int = 0,
                     cols_left: int = 0,
                     tile: tuple[int, int] | None = None,
                     rowinter: str = "xla",
                     ablate: frozenset = frozenset(),
                     vcf=None, hcf=None):
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
    pv, top, ph, left, vb, vc, hb, hc, *rest = statics
    sv, sh = rest if rest else (1, 1)    # legacy 8-tuple: S=1 both axes
    rows, iw = x.shape[-2:]
    # tile size: tih rows / tiw lanes PER PHASE (output tile pv*tih x
    # ph*tiw); shrink for short/narrow planes.  ``tile`` overrides for
    # on-chip sweeps (benchmarks/ab.py prepost).
    if tile is not None:
        tih, tiw = tile
    else:
        # round-4 on-chip sweep (benchmarks/ab.py prepost, KERNEL_NOTES
        # 4c): tiw must round UP so a phase's full width rides ONE block
        # when it fits — the round-3 policy's round-DOWN split 960 cols
        # into a full block plus a 64-useful-col runt and cost ~30%
        # (16.93 vs 12.96 ms at the bench geometry).  Taller tiles
        # measured flat (32/48/64 x 1024 within 0.5%), so tih stays 32.
        tih = max(8, min(32, (oh // pv) // 8 * 8))
        # slab scratch (2 x sq quadrant buffers) and its f32
        # color-converted copy scale with sq = sv*sh: shrink the lane
        # tile for high-step plans (x1.25/x0.75: sq 16) to stay in VMEM
        sq = sv * sh
        tiw_cap = 1024 if sq <= 4 else (512 if sq <= 8 else 256)
        tiw = max(128, min(tiw_cap, -(-(ow // ph) // 128) * 128))
    gh = -(-oh // (pv * tih))
    gw = -(-ow // (ph * tiw))
    # slab windows live in PARITY-PLANE coordinates (sv = sh = 1 makes
    # them the plain input coordinates): tap (q, k) reads quadrant row
    # vb//sv, so the window needs max(vb//sv) + tih rows per quadrant
    max_vb = max(v // sv for row in vb for v in row)
    max_hb = max(v // sh for row in hb for v in row)
    svp = -(-(max_vb + tih) // 8) * 8
    swp = -(-(max_hb + tiw) // 128) * 128
    # pad the input so every tile's slab window exists: slab (i, j) reads
    # quadrant rows [i*tih, i*tih + svp), cols [j*tiw, j*tiw + swp); edge
    # mode realizes the replicate border (and keeps the overshoot rows/
    # cols of the last tiles benign — their outputs crop)
    need_r = ((gh - 1) * tih + svp) * sv
    need_c = ((gw - 1) * tiw + swp) * sh
    lead_r, lead_c = top - rows_above, left - cols_left
    ypad = jnp.pad(
        x, ((0, 0), (0, 0),
            (lead_r, max(0, need_r - lead_r - rows)),
            (lead_c, max(0, need_c - lead_c - iw))),
        mode="edge")
    if sv > 1 or sh > 1:
        # parity deinterleave (padded coordinates): quadrant (svi, shi)
        # holds rows svi::sv x cols shi::sh — a bandwidth-trivial u8
        # relayout done once per call, after which every kernel tap is a
        # contiguous slice of one quadrant plane
        ypad = ypad[:, :, :need_r, :need_c]
        nb3 = ypad.shape[:2]
        ypad = ypad.reshape(*nb3, need_r // sv, sv, need_c // sh, sh)
        ypad = jnp.transpose(ypad, (0, 1, 3, 5, 2, 4)).reshape(
            *nb3, sv * sh, need_r // sv, need_c // sh)
    # generalized-plan coefficient planes: pad to the grid extent so the
    # blocked in_specs tile them exactly (padding feeds only cropped rows/
    # cols).  NumPy tables (the monolith) embed as tiny trace-time
    # constants; jnp arrays (a sharded caller's per-device slices) pad
    # with traced ops.
    vcf_j = hcf_j = None
    if vc is None:
        if isinstance(vcf, jnp.ndarray):
            vcf_j = jnp.pad(vcf, ((0, 0), (0, 0),
                                  (0, gh * tih - vcf.shape[2])))[..., None]
        else:
            v = np.zeros((pv, 4, gh * tih, 1), np.float32)
            v[:, :, :vcf.shape[2], 0] = vcf
            vcf_j = jnp.asarray(v)
    if hc is None:
        if isinstance(hcf, jnp.ndarray):
            hcf_j = jnp.pad(hcf, ((0, 0), (0, 0),
                                  (0, gw * tiw - hcf.shape[2])))[:, :, None]
        else:
            hcol = np.zeros((ph, 4, 1, gw * tiw), np.float32)
            hcol[:, :, 0, :hcf.shape[2]] = hcf
            hcf_j = jnp.asarray(hcol)
    return _fused_pre_call(ypad, tih, tiw, svp, swp, pv, ph, vb, vc, hb, hc,
                           gh, gw, sv=sv, sh=sh, rowinter=rowinter,
                           ablate=ablate, vcf=vcf_j,
                           hcf=hcf_j)[:, :, :oh, :ow]


def pre_upscale_fused(bgr_p, out_hw: tuple[int, int]):
    """Planar BGR u8 ``[B, 3, H, W]`` -> upscaled YCrCb u8 ``[B, 3, oh, ow]``.

    Fused color+bicubic pre-pass, bit-identical to
    ``resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)``.  Returns None
    when the geometry has no step<=4 phase plan on either axis (the
    caller falls back to the XLA engines); x1.5 (P=3, S=2), x1.25/x0.75
    (S=4) and 2:1/3:1/4:1 downscales (P=1) ride the parity-deinterleaved
    kernel path.
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    ih, iw = bgr_p.shape[-2:]
    if oh < 8 or ow < 128:
        return None                      # tiny planes: not worth a kernel
    statics, vcf, hcf = _pre_plans(oh, ih, ow, iw)
    if statics is None:
        return None
    squeeze = bgr_p.ndim == 3
    x = bgr_p[None] if squeeze else bgr_p
    out = _apply_fused_pre(x, oh, ow, statics, vcf=vcf, hcf=hcf)
    return out[0] if squeeze else out
