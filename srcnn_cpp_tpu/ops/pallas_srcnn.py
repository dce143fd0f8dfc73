"""Fused single-pass SRCNN kernel (Pallas/Mosaic, the performance path).

Replaces the reference's two hot loops — the fused ``Convolution99x11``
(reference src/srcnn.cpp:254-325) and ``Convolution55`` (:189-243) — with ONE
kernel that keeps every intermediate in VMEM.  The XLA path materializes the
64- and 32-channel feature planes in HBM (with 2-4x lane-padding blowup for
the small channel counts); this kernel streams row-band x column-band tiles
and never writes features to HBM at all.

Layout strategy (the part that makes the MXU work on a 1-input-channel conv,
within Mosaic's constraint that only the last two dims are vector axes):

* ``CC`` x-im2col: 9 column-shifted copies of the input slab stacked along
  sublanes, built with 9 whole-block copies;
* per feature row, the 81-tap patch matrix ``rp(96, TWp)`` is assembled
  from 9 contiguous 9-row windows of ``CC`` (one sublane-range concat, no
  middle-dim indexing), with conv1 weights pre-reordered to the matching
  dx-major tap order.  conv1 is then ``W1(64,96) @ rp`` — dense MXU work;
* conv2 is ``(32,64) @ f1`` on the same pixel lanes;
* conv3 splits into MXU + VPU: ``q = W3t(25,32) @ f2`` forms per-tap
  partials (N=25 instead of N=1), and the 5x5 stencil accumulates shifted
  rows of ``q`` into the output tile;
* float32 accuracy on a bf16 MXU via split-precision: f32 operands decompose
  hi+lo (hi = bf16(x), lo = bf16(x - hi)): 2 products for conv1 (uint8 input
  is exact in bf16), 3 for conv2/conv3 — ~2^-16 relative error, far below
  the 0.5-LSB quantization budget (validated in tests/test_pallas.py);
* the split-precision products are BLOCK-STACKED into one MXU pass per
  stage (``_kernel_stacked``): conv1 M-stacks [w1h; w1l] into a full-M
  (128, 96) weight; conv2/conv3 use ``[[wh, wh], [wl, 0]]`` blocks with
  [xh; xl] K-stacked operands so all three products accumulate in f32
  inside the MXU.  3 MXU passes per feature row instead of 8, each at
  higher array utilization.

Replicate padding: input-level clamp rows/cols are pre-padded by the
wrapper.  conv3's *feature-level* clamp at true image edges
(srcnn.cpp:200-210) differs from virtual-input extension in exactly the
outermost 2 rows/cols — the wrapper always recomputes that 2-px frame with
the XLA path (~2% extra work at 4K) instead of branching inside the kernel.

Round-4 additions: the kernel quantizes IN-KERNEL (conv3 bias +
IntTrim clip/truncate, u8 store — the XLA quantize pass cost a full f32
HBM round-trip); ``layout``/``ablate`` statics expose the measured-
negative dot restructures and profiling knockouts (KERNEL_NOTES 4a-4d);
``crcb`` additionally fuses the merge post-pass (bit-identical, measured
5 ms SLOWER than the separate merge kernel — kept as the reproduction
artifact, 4e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import _CB2B, _CB2G, _CR2G, _CR2R, _descale_f32
from ..ops.quantize import quantize_trunc_u8, split_hi_lo

#: conv1 taps (81) padded to a bf16 sublane multiple
_KTAPS = 96


def _split_hi_lo(x):
    """Shared excess-precision-proof hi/lo split (see ops/quantize.py)."""
    return split_hi_lo(x)


def _split_vmem(x):
    """The same split inside a Pallas kernel (Mosaic bitcast)."""
    return split_hi_lo(x, bitcast=pltpu.bitcast)


def _prep_weights(weights, stacked: bool = True,
                  layout: frozenset = frozenset()):
    """Packing of SRCNNWeights into kernel layouts (hi/lo bf16 pairs).

    Pure jnp so it traces under jit (weights may be tracers there).  conv1
    taps are reordered dx-major to match the kernel's patch assembly.

    ``stacked=True`` (production) folds each stage's split-precision matmuls
    into ONE block-stacked matmul (see the module docstring): conv1 M-stacks
    [w1h; w1l] to (128, 96) — full MXU M; conv2/conv3 pack
    ``[[wh, wh], [wl, 0]]`` so the hi·hi + hi·lo + lo·hi terms ride one
    K-stacked pass.  ``stacked=False`` keeps the 8-matmul layout (kept for
    on-chip A/B attribution only).

    ``layout`` selects per-stage alternative matmul structures (on-chip
    A/B candidates, KERNEL_NOTES round 4; each produces the same three
    split-precision products per stage, summed in a different f32 order —
    within the same ~2^-16 error class as the base layout):

    * ``"c1m"``  — conv1 M-stacked ``[w1h; w1l] (128, 96)``: full MXU M,
      K halved, single (96, tw4) patch operand; costs a (128, tw4) f32
      partial + halve-sum;
    * ``"c1two"`` — conv1 as two K=96 dots sharing one (96, tw4) operand;
    * ``"c2dots"`` — conv2 as ``[w2h|w2h] @ [f1h; f1l] + w2l @ f1h``:
      the K-axis concat shrinks from (192, tw4) to (128, tw4);
    * ``"c3dots"`` — same restructure for conv3 (concat (96,)->(64, tw4)).
    """
    w1 = jnp.asarray(weights.conv1_w, jnp.float32).reshape(64, 9, 9)
    w1 = jnp.transpose(w1, (0, 2, 1)).reshape(64, 81)     # [oc, dx*9+dy]
    w1p = jnp.zeros((64, _KTAPS), jnp.float32).at[:, :81].set(w1)
    w2 = jnp.asarray(weights.conv2_w, jnp.float32).reshape(32, 64)
    w3 = jnp.asarray(weights.conv3_w, jnp.float32).reshape(32, 25).T
    w3p = jnp.zeros((32, 32), jnp.float32).at[:25].set(w3)  # [tap, ic]
    b1 = jnp.asarray(weights.conv1_b, jnp.float32).reshape(64, 1)
    b2 = jnp.asarray(weights.conv2_b, jnp.float32).reshape(32, 1)
    b3 = jnp.asarray(weights.conv3_b, jnp.float32)[0]
    w1h, w1l = _split_hi_lo(w1p)
    w2h, w2l = _split_hi_lo(w2)
    w3h, w3l = _split_hi_lo(w3p)
    if not stacked:
        return (w1h, w1l, w2h, w2l, w3h, w3l, b1, b2, b3)
    # stacked kernel orders conv3 taps kx-major with ky REVERSED within
    # each kx block (t = kx*5 + (4-ky)): the 5x5 stencil then reduces with
    # four (5, tw) block adds (one per extra kx) instead of 25 single-row
    # ops, and the resulting t5 row r is the feature row's contribution to
    # output row rf-4+r — contiguous, so interior feature rows accumulate
    # with ONE 5-row block add (see _kernel_stacked)
    w3x = jnp.asarray(weights.conv3_w, jnp.float32).reshape(32, 5, 5)
    w3x = jnp.transpose(w3x, (2, 1, 0))[:, ::-1, :].reshape(25, 32)
    w3xp = jnp.zeros((32, 32), jnp.float32).at[:25].set(w3x)
    w3h, w3l = _split_hi_lo(w3xp)
    if "c1m" in layout:
        c1 = (jnp.concatenate([w1h, w1l], axis=0),)       # (128, 96)
    elif "c1two" in layout:
        c1 = (w1h, w1l)                                   # 2 x (64, 96)
    else:
        c1 = (jnp.concatenate([w1h, w1l], axis=1),)       # (64, 192)
    if "c2dots" in layout:
        c2 = (jnp.concatenate([w2h, w2h], axis=1), w2l)   # (32,128)+(32,64)
    elif "c2m" in layout:
        # M-stack the hi-operand products to a FULL-M dot (the round-4
        # decomposition measured the M=32 K-stacked dot at ~103 TFLOP/s
        # vs conv1's ~169 at M=64 — half the array rows idle)
        c2 = (jnp.concatenate([w2h, w2l], axis=0), w2h)   # (64,64)+(32,64)
    elif "c2b" in layout:
        # single block dot: [[w2h, w2h], [w2l, 0]] (64, 128) @ [f1h; f1l]
        # — rows 0:32 = w2h@f1h + w2h@f1l, rows 32:64 = w2l@f1h
        z = jnp.zeros_like(w2h)
        c2 = (jnp.concatenate(
            [jnp.concatenate([w2h, w2h], axis=1),
             jnp.concatenate([w2l, z], axis=1)], axis=0),)  # (64, 128)
    else:
        c2 = (jnp.concatenate([w2h, w2l, w2h], axis=1),)  # (32, 192)
    if "c3dots" in layout:
        c3 = (jnp.concatenate([w3h, w3h], axis=1), w3l)   # (32,64)+(32,32)
    elif "c3m" in layout:
        c3 = (jnp.concatenate([w3h, w3l], axis=0), w3h)   # (64,32)+(32,32)
    else:
        c3 = (jnp.concatenate([w3h, w3l, w3h], axis=1),)  # (32, 96)
    return (*c1, *c2, *c3, b1, b2, b3)


def _kernel(y_ref, w1h_ref, w1l_ref, w2h_ref, w2l_ref, w3h_ref, w3l_ref,
            b1_ref, b2_ref, out_ref, slab, cc, acc, dma_sem,
            *, th: int, tw: int, ablate: frozenset = frozenset()):
    """One (th x tw) output tile; DMAs an overlapping aligned slab.

    The slab is (th+16, tw+128): the logical (th+12, tw+12) window rounded
    up to DMA alignment (sublane multiple of 8, lane multiple of 128); the
    extra rows/cols are DMA'd but unused.
    """
    th4, tw4 = th + 4, tw + 4
    s_rows = th + 16
    i, j = pl.program_id(0), pl.program_id(1)

    # overlapping input windows can't be expressed as BlockSpec blocks; the
    # padded plane stays in HBM and each program DMAs its slab explicitly
    copy = pltpu.make_async_copy(
        y_ref.at[pl.ds(i * th, s_rows), pl.ds(j * tw, tw + 128)],
        slab, dma_sem)
    copy.start()
    copy.wait()
    # u8 -> i32 -> f32 -> bf16 (no direct u8->bf16 cast; 0-255 is exact)
    sb = slab[...].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    # x-im2col: 9 column-shifted copies stacked along sublanes
    for dx in range(9):
        cc[dx * s_rows:(dx + 1) * s_rows, :] = sb[:, dx:dx + tw4]

    w1h, w1l = w1h_ref[...], w1l_ref[...]
    w2h, w2l = w2h_ref[...], w2l_ref[...]
    w3h, w3l = w3h_ref[...], w3l_ref[...]
    b1, b2 = b1_ref[...], b2_ref[...]
    zero_pad = jnp.zeros((_KTAPS - 81, tw4), jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    split = _split_vmem

    acc[...] = jnp.zeros((th, tw), jnp.float32)

    # ``ablate`` (profiling only, never set on the production path): skip
    # named stages so their cost can be attributed on-chip by differencing
    # — "concat" uses a contiguous (wrong) slice instead of rp assembly,
    # "conv2" stops after conv1, "conv3" after conv2, "stencil" skips the
    # 5x5 scatter-accumulate.
    for rf in range(th4):  # feature rows cover output rows rf-2 .. rf+2
        if "concat" in ablate:
            rp = cc[rf:rf + _KTAPS, :]
        else:
            rp = jnp.concatenate(
                [cc[dx * s_rows + rf: dx * s_rows + rf + 9, :]
                 for dx in range(9)] + [zero_pad], axis=0)  # (96, tw4) bf16
        f1 = dot(w1h, rp) + dot(w1l, rp) + b1              # (64, tw4) f32
        f1 = jnp.maximum(f1, 0.0)
        if "conv2" in ablate:
            if rf < th:
                acc[rf:rf + 1, :] += f1[0:1, 0:tw]
            continue
        f1h, f1l = split(f1)
        f2 = dot(w2h, f1h) + dot(w2l, f1h) + dot(w2h, f1l) + b2
        f2 = jnp.maximum(f2, 0.0)                          # (32, tw4) f32
        if "conv3" in ablate:
            if rf < th:
                acc[rf:rf + 1, :] += f2[0:1, 0:tw]
            continue
        f2h, f2l = split(f2)
        q = dot(w3h, f2h) + dot(w3l, f2h) + dot(w3h, f2l)  # (32, tw4) f32
        if "stencil" in ablate:
            if rf < th:
                acc[rf:rf + 1, :] += q[0:1, 0:tw]
            continue

        # 5x5 stencil: scatter this feature row's 25 tap-partials into the
        # output rows it contributes to (all indices static: full unroll)
        for dy in range(5):
            ro = rf - dy
            if 0 <= ro < th:
                row = q[dy * 5 + 0: dy * 5 + 1, 0:tw]
                for dx2 in range(1, 5):
                    row = row + q[dy * 5 + dx2: dy * 5 + dx2 + 1, dx2:dx2 + tw]
                acc[ro:ro + 1, :] += row

    out_ref[...] = acc[...]


def _row_clamp_plan(h: int, th: int):
    """Static scatter corrections giving conv3's feature-ROW clamp in-kernel.

    The reference replicate-pads conv3 at the *feature* level
    (srcnn.cpp:200-210): output row ``g`` reads feature rows
    ``clamp(g + dy - 2, 0, h-1)``.  The kernel's virtually-extended input
    instead produces feature rows computed from edge-padded pixels, which
    differ in exactly the 2 outermost output rows.  Both semantics use the
    same per-tile feature rows, so the fix is a static rewiring of the
    stencil scatter: where ``clamp`` changes the source row, the default
    scatter is skipped in that tile and the tap is re-added when the
    clamped feature row comes through the loop.

    Returns ``(skips, extras)``: ``skips[(rf, dy)]`` is a tuple of tile row
    indices where that scatter must NOT run; ``extras[rf]`` lists
    ``(tile_i, dy, ro)`` additions of ``t5[dy]`` into ``out[ro]``.
    """
    skips: dict[tuple[int, int], list[int]] = {}
    extras: dict[int, list[tuple[int, int, int]]] = {}
    gh = -(-h // th)
    for it in sorted({0, gh - 2, gh - 1} & set(range(gh))):
        for gl in range(th):
            g = it * th + gl
            if g >= h or (2 <= g < h - 2):
                continue
            for dy in range(5):
                f_def = g + dy - 2
                f_true = min(max(f_def, 0), h - 1)
                if f_true == f_def:
                    continue
                skips.setdefault((gl + dy, dy), []).append(it)
                extras.setdefault(f_true - it * th + 2, []).append(
                    (it, dy, gl))
    return ({k: tuple(v) for k, v in skips.items()},
            {k: tuple(v) for k, v in extras.items()})


def _kernel_stacked(y_ref, *refs,
                    th: int, tw: int, ablate: frozenset = frozenset(),
                    gw: int = 0, total: int = 0, true_h: int = 0,
                    rpb: int = 1, layout: frozenset = frozenset(),
                    quant: bool = False, merge: bool = False):
    """K-stacked-matmul variant: one dot per stage per feature row.

    Every stage's split-precision products ride the K axis of a single dot
    with f32 in-MXU accumulation — conv1: (64, 192) [w1h | w1l] @ [rp; rp];
    conv2: (32, 192) [w2h | w2l | w2h] @ [f1h; f1h; f1l]; conv3: (32, 96)
    same @ [f2h; f2h; f2l].  K-stacking (vs M-stacking the weights) keeps
    every dot OUTPUT at its logical M — no (128, tw)/(64, tw) double-height
    partials to write, re-read and halve-sum, which matters because the
    kernel is VMEM-bandwidth-bound, not MXU-pass-bound (KERNEL_NOTES.md
    round 2).  Numerics: the same products as the 8-matmul layout, summed
    in one f32 K-reduction.  ``layout`` swaps in the per-stage alternative
    structures of :func:`_prep_weights` (A/B candidates, round 4).

    ``true_h`` (static) enables the in-kernel feature-row clamp
    (:func:`_row_clamp_plan`): the top/bottom 2 output rows then carry the
    reference's conv3 row semantics directly, and no top/bottom strip
    recompute is needed outside the kernel (left/right columns still are).
    """
    n1 = 2 if "c1two" in layout else 1
    n2 = 2 if ("c2dots" in layout or "c2m" in layout) else 1
    n3 = 2 if ("c3dots" in layout or "c3m" in layout) else 1
    w1refs = refs[:n1]
    w2refs = refs[n1:n1 + n2]
    w3refs = refs[n1 + n2:n1 + n2 + n3]
    if merge:
        # fused merge mode (round 4e): the kernel also consumes the
        # upscaled Cr/Cb tile (BlockSpec-pipelined, exactly out-aligned —
        # the merge is pointwise, no halo) and stores the final planar
        # BGR u8 tile.  The standalone merge kernel spent ~8 ms at the
        # bench geometry almost entirely in per-tile floor; here its math
        # rides the conv kernel's existing tile schedule and the Y' plane
        # never round-trips HBM at all.
        (b1_ref, b2_ref, b3_ref, crcb_ref, out_ref, slab, cc, acc,
         dma_sem) = refs[n1 + n2 + n3:]
    elif quant:
        # in-kernel final quantization: accumulate in an f32 scratch, add
        # the conv3 bias, clip+truncate and store u8 — the separate XLA
        # quantize pass cost a full f32 plane HBM round-trip (~9 B/px)
        (b1_ref, b2_ref, b3_ref, out_ref, slab, cc, acc,
         dma_sem) = refs[n1 + n2 + n3:]
    else:
        b1_ref, b2_ref, out_ref, slab, cc, dma_sem = refs[n1 + n2 + n3:]
        acc = out_ref
    th4, tw4 = th + 4, tw + 4
    s_rows = th + 16
    i, j = pl.program_id(0), pl.program_id(1)
    row_skips, row_extras = (_row_clamp_plan(true_h, th) if true_h
                             else ({}, {}))

    if total:
        # double-buffered slab DMA: tile t+1's slab streams in while tile t
        # computes (TPU grids run sequentially per core; scratch persists
        # across steps, so the copy started last step is ready to wait on)
        t = i * gw + j
        par = jax.lax.rem(t, 2)

        def _start(tn, slot):
            jn = jax.lax.rem(tn, gw)
            in_ = jax.lax.div(tn, gw)
            pltpu.make_async_copy(
                y_ref.at[pl.ds(in_ * th, s_rows), pl.ds(jn * tw, tw + 128)],
                slab.at[slot], dma_sem.at[slot]).start()

        @pl.when(t == 0)
        def _():
            _start(t, 0)

        @pl.when(t + 1 < total)
        def _():
            _start(t + 1, jax.lax.rem(t + 1, 2))

        pltpu.make_async_copy(
            y_ref.at[pl.ds(i * th, s_rows), pl.ds(j * tw, tw + 128)],
            slab.at[par], dma_sem.at[par]).wait()
        sb = slab[par]
    else:
        copy = pltpu.make_async_copy(
            y_ref.at[pl.ds(i * th, s_rows), pl.ds(j * tw, tw + 128)],
            slab, dma_sem)
        copy.start()
        copy.wait()
        sb = slab[...]
    sb = sb.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    for dx in range(9):
        cc[dx * s_rows:(dx + 1) * s_rows, :] = sb[:, dx:dx + tw4]

    w1 = tuple(r[...] for r in w1refs)
    w2 = tuple(r[...] for r in w2refs)
    w3 = tuple(r[...] for r in w3refs)
    b1, b2 = b1_ref[...], b2_ref[...]
    zero_pad = jnp.zeros((_KTAPS - 81, tw4), jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    split = _split_vmem
    single_rp = "c1m" in layout or "c1two" in layout  # (96, tw4) operand

    acc[...] = jnp.zeros((th, tw), jnp.float32)

    # ``rpb`` feature rows per iteration, lane-concatenated: the dots see
    # N = rpb*tw4 (identical per-column results — bit-exact) and every
    # elementwise/split/concat op issues once per BLOCK instead of once per
    # row, amortizing the VPU op-issue overhead that dominates per-row cost
    for rf0 in range(0, th4, rpb):
        nr = min(rpb, th4 - rf0)
        dup = 1 if single_rp else 2
        if "concat" in ablate:
            rp = cc[rf0:rf0 + dup * _KTAPS, 0:nr * tw4]
        elif nr == 1:
            windows = [cc[dx * s_rows + rf0: dx * s_rows + rf0 + 9, :]
                       for dx in range(9)] + [zero_pad]
            rp = jnp.concatenate(windows * dup, axis=0)  # (96|192, tw4)
        else:
            halves = []
            for r in range(nr):
                rf = rf0 + r
                halves.append(jnp.concatenate(
                    [cc[dx * s_rows + rf: dx * s_rows + rf + 9, :]
                     for dx in range(9)] + [zero_pad], axis=0))  # (96, tw4)
            one = jnp.concatenate(halves, axis=1)
            rp = one if single_rp else \
                jnp.concatenate([one, one], axis=0)    # (192, nr*tw4) bf16
        if "c1dot" in ablate:
            # profiling only: skip the conv1 MXU dot (wrong values, same
            # shapes) — isolates the dot from the DMA+cast+cc share
            f1 = rp[0:64, :].astype(jnp.float32) + b1
        elif "c1m" in layout:
            p = dot(w1[0], rp)                         # (128, nr*tw4) f32
            f1 = jnp.maximum(p[0:64, :] + p[64:128, :] + b1, 0.0)
        elif "c1two" in layout:
            f1 = jnp.maximum(dot(w1[0], rp) + dot(w1[1], rp) + b1, 0.0)
        else:
            f1 = jnp.maximum(dot(w1[0], rp) + b1, 0.0)  # (64, nr*tw4) f32
        if "conv2" in ablate:
            if rf0 < th:
                acc[rf0:rf0 + 1, :] += f1[0:1, 0:tw]
            continue
        if "split2" in ablate:
            # profiling only: skip the hi/lo decomposition (wrong values,
            # same downstream shapes) to attribute the split's VPU cost
            f1h = f1.astype(jnp.bfloat16)
            f1l = f1h
        else:
            f1h, f1l = split(f1)
        if "c2dots" in layout:
            f2 = jnp.maximum(
                dot(w2[0], jnp.concatenate([f1h, f1l], axis=0))
                + dot(w2[1], f1h) + b2, 0.0)
        elif "c2m" in layout:
            pm = dot(w2[0], f1h)                       # (64, nr*tw4) f32
            f2 = jnp.maximum(
                pm[0:32, :] + pm[32:64, :] + dot(w2[1], f1l) + b2, 0.0)
        elif "c2b" in layout:
            pm = dot(w2[0], jnp.concatenate([f1h, f1l], axis=0))
            f2 = jnp.maximum(pm[0:32, :] + pm[32:64, :] + b2, 0.0)
        else:
            f2 = jnp.maximum(
                dot(w2[0], jnp.concatenate([f1h, f1h, f1l], axis=0)) + b2,
                0.0)                                   # (32, nr*tw4) f32
        if "conv3" in ablate:
            if rf0 < th:
                acc[rf0:rf0 + 1, :] += f2[0:1, 0:tw]
            continue
        f2h, f2l = split(f2)
        if "c3dots" in layout:
            q = dot(w3[0], jnp.concatenate([f2h, f2l], axis=0)) \
                + dot(w3[1], f2h)                      # (32, nr*tw4)
        elif "c3m" in layout:
            pq = dot(w3[0], f2h)                       # (64, nr*tw4) f32
            q = pq[0:32, :] + pq[32:64, :] + dot(w3[1], f2l)
        else:
            q = dot(w3[0], jnp.concatenate([f2h, f2h, f2l], axis=0))
        if "stencil" in ablate:
            if rf0 < th:
                acc[rf0:rf0 + 1, :] += q[0:1, 0:tw]
            continue

        # taps are kx-major, ky-reversed per block (q row kx*5 + (4-ky)):
        # summing the 5 lane-shifted (5, tw) windows folds the horizontal
        # stencil in 4 block adds, and t5 row r is this feature row's
        # contribution to output row rf-4+r (same ascending-kx add order as
        # the scalar-row form).  Interior feature rows — full window inside
        # the tile, no clamp rewiring — accumulate with ONE contiguous
        # 5-row block add; each out row still receives exactly one
        # contribution per rf in ascending-rf order, so bit-exact.
        for r in range(nr):
            rf = rf0 + r
            qq = q[:, r * tw4:(r + 1) * tw4]
            t5 = qq[0:5, 0:tw]
            for kx in range(1, 5):
                t5 = t5 + qq[5 * kx: 5 * kx + 5, kx:kx + tw]
            if "rowstencil" not in ablate and 4 <= rf < th \
                    and rf not in row_extras and not any(
                        (rf, dy) in row_skips for dy in range(5)):
                acc[rf - 4:rf + 1, :] += t5[:, :]
                continue
            for dy in range(5):
                ro = rf - dy
                if 0 <= ro < th:
                    sk = row_skips.get((rf, dy), ())
                    if sk:
                        cond = i != sk[0]
                        for itx in sk[1:]:
                            cond = cond & (i != itx)

                        @pl.when(cond)
                        def _(ro=ro, dy=dy, t5=t5):
                            acc[ro:ro + 1, :] += t5[4 - dy:5 - dy, :]
                    else:
                        acc[ro:ro + 1, :] += t5[4 - dy:5 - dy, :]
            for itx, dy, ro in row_extras.get(rf, ()):
                @pl.when(i == itx)
                def _(ro=ro, dy=dy, t5=t5):
                    acc[ro:ro + 1, :] += t5[4 - dy:5 - dy, :]

    if merge:
        # the reference's IntTrim quantization in f32 (trunc toward zero
        # then clamp — an int-valued f32 equals the u8 the merge engine
        # reads), then OpenCV's exact fixed-point inverse color transform
        # (ops/pallas_merge.py numerics: every product/sum an integer
        # < 2^23, exact in f32)
        yq = jnp.clip(jnp.trunc(acc[...] + b3_ref[0, 0]), 0.0, 255.0)
        cr = crcb_ref[0].astype(jnp.int32).astype(jnp.float32) - 128.0
        cb = crcb_ref[1].astype(jnp.int32).astype(jnp.float32) - 128.0

        def store(c, plane):
            out_ref[c] = jnp.clip(plane, 0.0, 255.0) \
                .astype(jnp.int32).astype(jnp.uint8)

        store(0, yq + _descale_f32(cb * _CB2B))
        store(1, yq + _descale_f32(cb * _CB2G + cr * _CR2G))
        store(2, yq + _descale_f32(cr * _CR2R))
    elif quant:
        # conv3 bias + the reference's IntTrim quantization (clip-then-
        # truncate == truncate-then-clip for monotone clip; f32->i32 in
        # Mosaic rounds toward zero like the C cast, srcnn.cpp:238-240)
        out_ref[...] = jnp.clip(acc[...] + b3_ref[0, 0], 0.0, 255.0) \
            .astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("th", "tw", "ablate", "dbuf", "true_h",
                                    "rpb", "layout", "quant"))
def _fused_call(y_pad, packed, th: int, tw: int,
                ablate: frozenset = frozenset(), dbuf: bool = True,
                true_h: int = 0, rpb: int = 1,
                layout: frozenset = frozenset(), quant: bool = True,
                crcb=None):
    *wrefs, b3 = packed
    stacked = len(wrefs) == 5 or bool(layout)  # (w1s, w2s, w3s, b1, b2)
    # the in-kernel feature-row clamp is only implemented by the stacked
    # kernel; silently ignoring true_h would return wrong border rows
    assert stacked or not true_h, \
        "true_h row-clamp requires the stacked weight layout"
    hp, wp = y_pad.shape
    gh, gw = (hp - 16) // th, (wp - 128) // tw
    th4, tw4 = th + 4, tw + 4
    interpret = jax.default_backend() == "cpu"  # hermetic CPU tests
    dbuf = dbuf and stacked
    # in-kernel quantization (stacked production path, no ablation): the
    # kernel adds the conv3 bias and stores the final u8 directly — the
    # separate XLA quantize pass wrote+read the full f32 plane in HBM
    # (~9 B/px).  Ablate variants keep the f32 output (they emit raw
    # partials for attribution); the legacy 8-matmul kernel too.
    # ``crcb`` (2, gh*th, gw*tw) additionally fuses the merge post-pass:
    # the kernel consumes the out-aligned Cr/Cb tiles and emits planar
    # BGR (3, gh*th, gw*tw) u8 directly.
    quant = quant and stacked and not ablate
    merge = crcb is not None
    assert not merge or quant, "merge requires the quantizing kernel"
    if stacked:
        body = functools.partial(
            _kernel_stacked, th=th, tw=tw, ablate=ablate,
            gw=gw, total=gh * gw if dbuf else 0, true_h=true_h,
            rpb=1 if ablate else rpb, layout=layout, quant=quant,
            merge=merge)
    else:
        body = functools.partial(_kernel, th=th, tw=tw, ablate=ablate)
    slab_shape = (2, th + 16, tw + 128) if dbuf else (th + 16, tw + 128)
    ops = (*wrefs, b3.reshape(1, 1)) if quant else tuple(wrefs)
    extra_specs, extra_args = [], []
    if merge:
        extra_specs.append(pl.BlockSpec((2, th, tw), lambda i, j: (0, i, j),
                                        memory_space=pltpu.VMEM))
        extra_args.append(crcb)
    out = pl.pallas_call(
        body,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # padded plane, HBM
            *[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ops),
            *extra_specs,
        ],
        out_specs=(pl.BlockSpec((3, th, tw), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM) if merge else
                   pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((3, gh * th, gw * tw), jnp.uint8)
                   if merge else
                   jax.ShapeDtypeStruct((gh * th, gw * tw),
                                        jnp.uint8 if quant
                                        else jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, y_pad.dtype),               # slab (aligned)
            pltpu.VMEM((9 * (th + 16), tw4), jnp.bfloat16),    # cc
            # f32 accumulator: the u8-emitting kernel needs a scratch; the
            # f32-emitting stacked kernel accumulates into its out block
            *([pltpu.VMEM((th, tw), jnp.float32)] if quant or not stacked
              else []),
            pltpu.SemaphoreType.DMA((2,) if dbuf else ()),
        ],
        interpret=interpret,
    )(y_pad, *ops, *extra_args)
    return out if quant else quantize_trunc_u8(out + b3)


def _pick_tiles(h: int, w: int) -> tuple[int, int]:
    """Tile sizes: th rows x tw cols per program, VMEM-bounded.

    Round-2 on-device sweeps (stacked kernel, KERNEL_NOTES.md): MP/s rises
    monotonically with tile area — (16,640) 671 -> (32,1280) 855 ->
    (64,1280) 881 -> (64,3840) 923 at single-4K; at the packed batch
    geometry (72,3712)/(80,3712) beat (64,3712) by 2.7-3.5% (fewer halo
    rows; 72 divides 1080, 80 divides 2160).  The round-2 th<=80 cap
    came from a (96,1280) VMEM spill of the F32-OUT kernel; the round-5
    re-sweep with the u8-out quant kernel (benchmarks/ab.py kernel
    packed[,4k]) compiles through th=136 and measures th=120 best at the
    4K composite (32.53 ms vs 80's 34.12) and second-best at 1080p
    (30.81 vs 136's 30.24, vs 72's 31.41) — the cap moves to 128, whose
    feature-row objective picks 120 at every production height (120
    divides both 1080 and 2160).  The cost model: per-feature-row work
    is amortized over tw pixels, and redundant halo rows per tile fall
    as (th+4)/th — so take the FULL image width (capped at 3840, where
    cc + intermediates stay inside the ~16 MB VMEM) and the tallest
    non-spilling th.  tw is a lane multiple (128); th a sublane multiple
    (8), shrunk for short images to avoid padding blowup.
    """
    # th: minimize total feature rows computed, ceil(h/th) * (th + 4 halo),
    # over sublane-multiple heights up to 128 (ties -> taller, fewer tiles)
    th = min((-(-h // t) * (t + 4), -t) for t in range(8, 136, 8))
    th = -th[1]
    cols = max(1, -(-w // 3840))
    tw = max(128, -(-(-(-w // cols)) // 128) * 128)
    return th, tw


def srcnn_y_fused(y_u8, weights, pack: bool = True):
    """uint8 Y plane(s) ``[H, W]`` / ``[B, H, W]`` -> uint8, fused kernel.

    Matches the XLA/oracle path to <=1 quantization LSB (the split-precision
    matmuls carry ~2^-16 relative error).  Border semantics are identical to
    the reference: input-level clamp for conv1 via pre-padding; conv3's
    feature-level clamp via the 2-px frame recompute in :func:`_fix_edges`.
    """
    if y_u8.ndim == 3:
        b, h, w = y_u8.shape
        if pack and b > 1 and h >= 8 and w > 8:
            # pack the batch on the LANE axis: frames concatenated with 4+4
            # replicate columns (input-level clamp for every non-corner
            # output; the 2-px frame is recomputed by the edge fix anyway)
            # -> ONE kernel call with full-width (<=3840) tiles.  vs the
            # per-frame lax.map at tw=w this halves the per-feature-row op
            # issues for w around 1920 and drops the per-frame invocation
            # overhead; true_h applies to all frames at once (same height).
            blocks = jnp.concatenate([
                jnp.repeat(y_u8[:, :, :1], 4, axis=2), y_u8,
                jnp.repeat(y_u8[:, :, -1:], 4, axis=2)], axis=2)
            wc = b * (w + 8)
            comp = jnp.swapaxes(blocks, 0, 1).reshape(h, wc)
            th, tw = _pick_tiles(h, wc)
            hp = ((h + th - 1) // th) * th
            wp = ((wc + tw - 1) // tw) * tw
            ypad = jnp.pad(comp, ((6, 10 + hp - h), (6, 122 + wp - wc)),
                           mode="edge")
            out = _fused_call(ypad, _prep_weights(weights), th, tw, true_h=h)
            out = out[:h, :wc].reshape(h, b, w + 8)[:, :, 4:4 + w]
            return _fix_edges_batch(jnp.swapaxes(out, 0, 1), y_u8, weights)
        # fallback: lax.map runs the kernel per frame inside one jit (a
        # vmap'd pallas_call with an ANY-memory operand is not batchable on
        # TPU; sequential invocations lose nothing on a single core)
        th, tw = _pick_tiles(h, w)
        hp = ((h + th - 1) // th) * th
        wp = ((w + tw - 1) // tw) * tw
        y = jnp.pad(y_u8, ((0, 0), (6, 10 + hp - h), (6, 122 + wp - w)),
                    mode="edge")
        packed = _prep_weights(weights)
        out = jax.lax.map(
            lambda yp: _fused_call(yp, packed, th, tw, true_h=h), y)
        out = out[:, :h, :w]
        if h >= 8 and w > 8:
            return _fix_edges_batch(out, y_u8, weights)
        return jax.vmap(lambda o, yy: _fix_edges(o, yy, weights))(out, y_u8)
    h, w = y_u8.shape
    th, tw = _pick_tiles(h, w)
    hp = ((h + th - 1) // th) * th
    wp = ((w + tw - 1) // tw) * tw
    # 6-px replicate halo + DMA-alignment slack (4 rows, 116 cols)
    y = jnp.pad(y_u8, ((6, 10 + hp - h), (6, 122 + wp - w)), mode="edge")
    packed = _prep_weights(weights)
    out = _fused_call(y, packed, th, tw, true_h=h)
    if h >= 8 and w > 8:
        return _fix_edges_batch(out[None, :h, :w], y_u8[None], weights)[0]
    return _fix_edges(out[:h, :w], y_u8, weights)


def srcnn_merge_fused(up, weights):
    """Upscaled YCrCb u8 ``[B, 3, H, W]`` -> planar BGR u8, ONE kernel.

    Fuses the conv stack (on Y), the reference's IntTrim quantization, the
    merge and the inverse color transform (srcnn.cpp:609-657) into the
    packed conv kernel: Cr/Cb tiles are BlockSpec-pipelined alongside the
    conv's out tiles (the merge is pointwise — no halo) and the kernel
    stores planar BGR directly.  vs the separate merge kernel this
    removes the Y' HBM round-trip and the merge pass's per-tile floor
    (~8 ms at the bench geometry, KERNEL_NOTES 4c/4e).

    Numerics: identical op sequences to ``srcnn_y_fused`` +
    ``merge_ycrcb_to_bgr_fused`` — the conv3 feature-COLUMN clamp at the
    2-px left/right edges is applied by recomputing those BGR columns
    from the fixed Y values (the in-kernel row-clamp plan handles rows).
    Returns None for shapes below the kernel minimum.

    STATUS: measured NEGATIVE for production (KERNEL_NOTES 4e) — the
    interleaved on-chip A/B put this 5 ms/batch-32 SLOWER than the
    separate merge kernel (56.0 vs 51.0 ms chained, outputs bit-equal):
    the Cr/Cb block pipelining + per-channel color stores extend the conv
    kernel's per-tile critical path by more than the standalone merge
    pass costs.  Kept (tested, gated) as the reproduction artifact.
    """
    b, c, h, w = up.shape
    if c != 3 or h < 8 or w <= 8:
        return None
    y_u8 = up[:, 0]
    # lane-axis frame packing, exactly as srcnn_y_fused's pack branch
    blocks = jnp.concatenate([
        jnp.repeat(y_u8[:, :, :1], 4, axis=2), y_u8,
        jnp.repeat(y_u8[:, :, -1:], 4, axis=2)], axis=2)
    wc = b * (w + 8)
    comp = jnp.swapaxes(blocks, 0, 1).reshape(h, wc)
    th, tw = _pick_tiles(h, wc)
    hp = ((h + th - 1) // th) * th
    wp = ((wc + tw - 1) // tw) * tw
    ypad = jnp.pad(comp, ((6, 10 + hp - h), (6, 122 + wp - wc)),
                   mode="edge")
    # Cr/Cb in the same packed layout (pad-column values are arbitrary —
    # every padded output column is cropped)
    cc2 = jnp.concatenate([
        jnp.repeat(up[:, 1:, :, :1], 4, axis=3), up[:, 1:],
        jnp.repeat(up[:, 1:, :, -1:], 4, axis=3)], axis=3)  # (B,2,H,W+8)
    comp2 = jnp.transpose(cc2, (1, 2, 0, 3)).reshape(2, h, wc)
    crcb = jnp.pad(comp2, ((0, 0), (0, hp - h), (0, wp - wc)))
    out = _fused_call(ypad, _prep_weights(weights), th, tw, true_h=h,
                      crcb=crcb)                    # (3, hp, wp) u8 BGR
    out = out[:, :h, :wc].reshape(3, h, b, w + 8)[:, :, :, 4:4 + w]
    bgr = jnp.transpose(out, (2, 0, 1, 3))          # (B, 3, h, w)

    # conv3's feature-COLUMN clamp: fix the 2-px left/right Y columns
    # (strip kernel + corner patches, same as the unfused path) and
    # recompute the affected BGR columns with the exact color transform
    from .color import ycrcb2bgr_u8_planar

    m = min(2, w)
    # zeros base: _fix_edges_batch only WRITES the edge columns/corners,
    # and only those regions are read below — the interior is never used
    yfix = _fix_edges_batch(jnp.zeros_like(y_u8), y_u8, weights)
    for sl in (slice(0, m), slice(w - m, w)):
        strip = jnp.stack(
            [yfix[:, :, sl], up[:, 1, :, sl], up[:, 2, :, sl]], axis=1)
        bgr = bgr.at[:, :, :, sl].set(ycrcb2bgr_u8_planar(strip))
    return bgr


def _fix_edges(out, y_u8, weights):
    """Recompute the 2-px columns where conv3's feature-COLUMN clamp applies.

    The kernel extends the input virtually; the reference clamps f2 feature
    rows/cols instead (srcnn.cpp:200-210).  Rows are handled inside the
    kernel (``_row_clamp_plan`` — a static scatter rewiring, free).  Columns
    sit on the lane axis where a 2-lane rewiring is not expressible, so the
    2-px left/right strips are recomputed with the split-precision XLA path.
    Strip depth 8 is exact: output col 1 reaches f2 col 3 (conv3 radius 2)
    which reaches input col 7 (conv1 radius 4), and every out-of-strip
    access is the same edge clamp the full image applies.  Corner semantics:
    the strips edge-pad BOTH dims, so the 2x2 corners carry the reference's
    row+column clamp.  Split precision carries ~2^-16 error, same as the
    kernel.
    """
    from .srcnn import srcnn_y_split as srcnn_y

    h, w = y_u8.shape
    cs = min(w, 8)    # strip depth: exact minimum interior context
    m = min(2, w)
    # left+right strips are (h, 8): 8 lanes of 128 — catastrophic VPU/MXU
    # layout (measured 33 ms of a 110 ms batch-32 1080p dispatch).  Run them
    # TRANSPOSED instead: corr2d(x^T, k^T) == corr2d(x, k)^T, and conv2 is
    # 1x1, so spatially transposing the conv1/conv3 taps suffices.
    lr = srcnn_y(jnp.stack([y_u8[:, :cs].T, y_u8[:, w - cs:].T]),
                 _transpose_weights(weights))
    out = out.at[:, :m].set(lr[0, :m, :].T)
    out = out.at[:, w - m:].set(lr[1, cs - m:, :].T)
    return out


def _transpose_weights(weights):
    """Spatially transposed taps: corr2d(x^T, k^T) == corr2d(x, k)^T.

    conv2 is 1x1, so swapping the conv1/conv3 spatial axes suffices for
    running the stack on transposed planes.
    """
    from ..weights.loader import SRCNNWeights

    return SRCNNWeights(
        conv1_w=jnp.swapaxes(jnp.asarray(weights.conv1_w), -1, -2),
        conv1_b=weights.conv1_b,
        conv2_w=weights.conv2_w,
        conv2_b=weights.conv2_b,
        conv3_w=jnp.swapaxes(jnp.asarray(weights.conv3_w), -1, -2),
        conv3_b=weights.conv3_b)


def _fix_edges_batch(out, y_u8, weights):
    """Edge-column fix for a whole batch via ONE fused-kernel pass.

    Same semantics as :func:`_fix_edges` (reference feature-level clamp,
    srcnn.cpp:200-210), restructured for speed: the per-frame XLA strip
    recompute cost ~9 ms at batch-32 1080p (64 tiny C=1 convs with HBM
    feature planes), dominated by layout overhead, not math.

    Here all 2B transposed 8-deep edge strips are concatenated along the
    LANE axis into one ``(8, 2B*(oh+8))`` composite — each strip block
    carries 4 replicate columns on each side, which reproduces the
    input-level clamp for every output we keep — and a single
    ``_fused_call`` with ``true_h=8`` runs over it with the SPATIALLY
    TRANSPOSED weights (corr2d(x^T, k^T) == corr2d(x, k)^T; conv2 is 1x1).
    The in-kernel row-clamp plan then gives rows {0,1} (left-strip edges)
    and {6,7} (right-strip edges) the reference's feature-ROW clamp — which
    is the original image's feature-COLUMN clamp.  The 2x2 corners
    additionally need the feature clamp along the composite's lane axis
    (the original row axis), which the kernel's virtual extension does not
    provide — they are recomputed from 8x8 corner patches with the
    split-precision XLA path (both-dim edge pad, as before).

    Numerics: the fused kernel and the XLA split path carry the same
    ~2^-16 split-precision error as the interior.
    """
    from .srcnn import srcnn_y_split

    b, h, w = y_u8.shape
    m = 2
    # (2B, 8, h) transposed strips; left edge at row 0, right edge at row 7
    strips = jnp.concatenate([
        jnp.swapaxes(y_u8[:, :, :8], 1, 2),
        jnp.swapaxes(y_u8[:, :, w - 8:], 1, 2)], axis=0)
    blocks = jnp.concatenate([
        jnp.repeat(strips[:, :, :1], 4, axis=2),
        strips,
        jnp.repeat(strips[:, :, -1:], 4, axis=2)], axis=2)  # (2B, 8, h+8)
    wc = 2 * b * (h + 8)
    comp = jnp.swapaxes(blocks, 0, 1).reshape(8, wc)

    _, tw = _pick_tiles(8, wc)
    wp = -(-wc // tw) * tw
    ypad = jnp.pad(comp, ((6, 10), (6, 122 + wp - wc)), mode="edge")
    cf = _fused_call(ypad, _prep_weights(_transpose_weights(weights)),
                     8, tw, true_h=8)
    cf = cf[:, :wc].reshape(8, 2 * b, h + 8)[:, :, 4:4 + h]

    out = out.at[:, :, :m].set(jnp.transpose(cf[:m, :b, :], (1, 2, 0)))
    out = out.at[:, :, w - m:].set(
        jnp.transpose(cf[8 - m:, b:, :], (1, 2, 0)))

    # corners: 8x8 patches, both-dim feature clamp via the XLA path
    pat = jnp.stack([
        y_u8[:, :8, :8], y_u8[:, :8, w - 8:],
        y_u8[:, h - 8:, :8], y_u8[:, h - 8:, w - 8:]], axis=1)
    cout = srcnn_y_split(pat.reshape(4 * b, 8, 8), weights)
    cout = cout.reshape(b, 4, 8, 8)
    out = out.at[:, :m, :m].set(cout[:, 0, :m, :m])
    out = out.at[:, :m, w - m:].set(cout[:, 1, :m, 8 - m:])
    out = out.at[:, h - m:, :m].set(cout[:, 2, 8 - m:, :m])
    out = out.at[:, h - m:, w - m:].set(cout[:, 3, 8 - m:, 8 - m:])
    return out
