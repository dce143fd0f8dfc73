"""On-chip A/B harness — ONE parameterized runner for every micro/stage
experiment of rounds 1-4 (consolidates the former kernel_ab.py,
kernel_ablate.py, hmode_ab.py and prepost_ab.py; all historical numbers
recorded under those names in KERNEL_NOTES.md map to the subcommands
below).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab.py <cmd> ...

Subcommands:
    kernel <exp> [4k] [m]   fused-conv-kernel experiments (ex kernel_ab.py):
        stacked   8-matmul kernel vs block-stacked kernel, single-4K tiles
        dbuf      double-buffered slab DMA on/off
        rpb       rows-per-block lane batching (1/2/4)
        stencil   per-row scatter vs contiguous block stencil (+ row clamp)
        packed    tile sweep at the lane-packed batch geometry ("4k" for
                  the 8x4K packing instead of 32x1080p)
        layout    per-stage matmul-structure candidates (c1m/c1two/c2dots/
                  c3dots; add "m" for the M-stack/block family c2m/c3m/c2b)
        quant     in-kernel u8 quantization vs f32-out + XLA quantize
    ablate [4k|packed|packed4k]   conv-kernel stage attribution by
        progressive in-kernel knockout (ex kernel_ablate.py); "packed"
        modes reproduce the PRODUCTION lane-packed composite
    hmode                    dense vs phase horizontal resize pass, chained
        in-pipeline at batch-8 1080p->4K (ex hmode_ab.py)
    prepost pre|post|preablate   tile sweeps / stage ablation of the fused
        pre (color+bicubic) and post (merge+color) Pallas passes at the
        bench geometry (ex prepost_ab.py)
    prefuse                  round-5 free-Y bound on the pre→conv fusion
        boundary: production fused pipeline vs the same pipeline with the
        pre-pass's Y chains knocked out (KERNEL_NOTES 5a)

Methodology for every subcommand: benchmarks/_runner.py — interleaved
best-of-N in one process (the shared chip drifts run to run), completion
fenced by a tiny host fetch, per-variant compile-failure tolerance, and a
bit-check of every non-ablate variant against its anchor before timing.
"""

from __future__ import annotations

import sys
from pathlib import Path

# self-sufficient invocation: `python benchmarks/ab.py` puts benchmarks/
# on sys.path, not the repo root the package lives in
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from _runner import compile_all, print_table, time_interleaved
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

H4K, W4K = 2160, 3840


# ---------------------------------------------------------------- kernel


def _pad_plane(base, th, tw, halo: bool):
    """Pad a plane for _fused_call: (gh*th+16, gw*tw+128), edge mode.

    ``halo=True`` uses the production wrapper's 6-px replicate halo
    offsets (packed geometry); ``halo=False`` pads only at the far edges
    (kernel-only timing on a raw plane).
    """
    h, w = base.shape
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    if halo:
        return np.pad(base, ((6, 10 + hp - h), (6, 122 + wp - w)),
                      mode="edge")
    return np.pad(base, ((0, hp + 16 - h), (0, wp + 128 - w)), mode="edge")


def _kernel_experiment(name: str, flags):
    """-> (plane_hw, halo, mp, cases); each case is (name, pk_tag, th, tw,
    kwargs)."""
    if name == "packed":
        b, h, w = (8, H4K, W4K) if "4k" in flags else (32, 1080, 1920)
        wc = b * (w + 8)
        cases = [(f"{th}x{tw}-r{rpb}", "new", th, tw,
                  dict(true_h=h, rpb=rpb))
                 for th, tw, rpb in [(64, 3712, 1), (72, 3712, 1),
                                     (80, 3712, 1), (64, 1856, 2),
                                     (32, 3712, 1), (64, 2560, 1),
                                     # round-5 retry of taller tiles: the
                                     # round-2 th<=80 cap predates the
                                     # u8-out quant kernel (smaller out
                                     # blocks; VMEM profile changed)
                                     (88, 3712, 1), (96, 3712, 1),
                                     (104, 3712, 1), (120, 3712, 1),
                                     (128, 3712, 1), (136, 3712, 1),
                                     (152, 3712, 1)]]
        return (h, wc), True, b * h * w / 1e6, cases
    if name == "quant":
        b, h, w = (8, H4K, W4K) if "4k" in flags else (32, 1080, 1920)
        wc = b * (w + 8)
        th = 80 if "4k" in flags else 72
        cases = [("quant-kernel", "new", th, 3712,
                  dict(true_h=h, quant=True)),
                 ("quant-xla", "new", th, 3712,
                  dict(true_h=h, quant=False))]
        return (h, wc), True, b * h * w / 1e6, cases
    if name == "layout":
        b, h, w = (8, H4K, W4K) if "4k" in flags else (32, 1080, 1920)
        wc = b * (w + 8)
        th = 80 if "4k" in flags else 72
        layouts = (["base", "c2m", "c2b", "c3m", "c2m+c3m", "c2b+c3m"]
                   if "m" in flags else
                   ["base", "c1m", "c1two", "c2dots", "c3dots",
                    "c2dots+c3dots", "c1m+c2dots+c3dots",
                    "c1two+c2dots+c3dots"])
        cases = []
        for spec in layouts:
            lay = frozenset(spec.split("+")) - {"base"}
            cases.append((spec, f"lay:{spec}", th, 3712,
                          dict(true_h=h, layout=lay)))
        return (h, wc), True, b * h * w / 1e6, cases
    mp = H4K * W4K / 1e6
    if name == "stacked":
        tiles = [(16, 640), (24, 640), (32, 640), (16, 768), (32, 512)]
        cases = [("old-16x640", "old", 16, 640, {})]
        cases += [(f"new-{th}x{tw}", "new", th, tw, {}) for th, tw in tiles]
    elif name == "dbuf":
        cases = [("dbuf-off", "new", 64, 3840, dict(dbuf=False)),
                 ("dbuf-on-1920", "new", 64, 1920, dict(dbuf=True)),
                 ("dbuf-on-3840", "new", 64, 3840, dict(dbuf=True))]
    elif name == "rpb":
        cases = [(f"r{rpb}-{th}x{tw}", "new", th, tw, dict(rpb=rpb))
                 for th, tw, rpb in [(64, 3840, 1), (64, 960, 2),
                                     (64, 1280, 2), (64, 640, 4),
                                     (32, 1280, 2)]]
    elif name == "stencil":
        cases = [
            ("row-stencil", "new", 64, 3840,
             dict(ablate=frozenset({"rowstencil"}))),
            ("block-stencil", "new", 64, 3840, {}),
            ("block+clamp", "new", 64, 3840, dict(true_h=H4K)),
        ]
    else:
        raise SystemExit(f"unknown kernel experiment {name!r}; see --help")
    return (H4K, W4K), False, mp, cases


def kernel_main(argv) -> None:
    from srcnn_cpp_tpu.ops.pallas_srcnn import _fused_call, _prep_weights

    if not argv:
        print(__doc__)
        return
    exp = argv[0]
    (h, w), halo, mp, cases = _kernel_experiment(exp, argv[1:])

    weights = load_weights()
    packs = {
        "old": jax.tree_util.tree_map(
            jnp.asarray, _prep_weights(weights, stacked=False)),
        "new": jax.tree_util.tree_map(
            jnp.asarray, _prep_weights(weights, stacked=True)),
    }
    for _, tag, _, _, _ in cases:
        if tag.startswith("lay:") and tag not in packs:
            lay = frozenset(tag[4:].split("+")) - {"base"}
            packs[tag] = jax.tree_util.tree_map(
                jnp.asarray, _prep_weights(weights, layout=lay))
    base = np.random.default_rng(0).integers(0, 256, (h, w), dtype=np.uint8)

    def make(tag, th, tw, kw):
        y = jnp.asarray(_pad_plane(base, th, tw, halo))
        return (lambda y=y, pk=packs[tag], th=th, tw=tw, kw=kw:
                _fused_call(y, pk, th, tw, **kw))

    fns, outs = compile_all(
        {name: make(tag, th, tw, kw) for name, tag, th, tw, kw in cases})

    # device-side diff, scalar fetch only (a bulk np.asarray would pull
    # ~66 MB/variant through the ~10-30 MB/s dev tunnel)
    maxdiff = jax.jit(lambda a, b: jnp.abs(
        a[:h, :w].astype(jnp.int32) - b[:h, :w].astype(jnp.int32)).max())
    anchor = next(iter(outs))
    for name, o in outs.items():
        if name == anchor:
            continue
        d = int(maxdiff(outs[anchor], o))
        # clamp/ablate variants legitimately differ at borders; report all
        print(f"bit-check {anchor} vs {name}: max LSB {d}", flush=True)

    best = time_interleaved(fns, rounds=5, iters=4)
    print_table(f"[{exp}] plane {w}x{h}, useful {mp:.1f} MP", best, mp)


# ---------------------------------------------------------------- ablate

ABLATE_VARIANTS = [
    ("full", frozenset()),
    ("no-split", frozenset({"split2"})),   # conv2/3 split cost (f1 only)
    ("no-stencil", frozenset({"stencil"})),
    ("conv1+2", frozenset({"conv3"})),
    ("conv1", frozenset({"conv2"})),
    ("conv1/no-concat", frozenset({"conv2", "concat"})),
    ("dma+cast+cc", frozenset({"conv2", "concat", "c1dot"})),
]


def ablate_main(argv) -> None:
    """Conv-kernel stage attribution by progressive in-kernel knockout.

    ``packed``/``packed4k`` reproduce the PRODUCTION lane-packed composite
    (true_h row clamp on, (72,3712)/(80,3712) tiles) that the pipeline
    actually runs — VERDICT r3 item 1 asked for shares at this geometry.
    """
    from srcnn_cpp_tpu.ops.pallas_srcnn import (_fused_call, _pick_tiles,
                                                _prep_weights)

    weights = load_weights()
    packed = jax.tree_util.tree_map(jnp.asarray, _prep_weights(weights))
    mode = argv[0] if argv else "4k"
    kw = {}
    if mode.startswith("packed"):
        # the production lane-packed composite (srcnn_y_fused pack branch):
        # b frames concatenated on the lane axis with 4+4 replicate cols
        b, fh, fw = (8, H4K, W4K) if mode == "packed4k" else (32, 1080, 1920)
        h, w = fh, b * (fw + 8)
        kw = dict(true_h=h)
        mp = b * fh * fw / 1e6
    else:
        h, w = H4K, W4K
        mp = H4K * W4K / 1e6
    th, tw = _pick_tiles(h, w)
    hp = ((h + th - 1) // th) * th
    wp = ((w + tw - 1) // tw) * tw
    y = np.random.default_rng(0).integers(
        0, 256, (hp + 16, wp + 128), dtype=np.uint8)
    yd = jnp.asarray(y)

    fns, _ = compile_all({
        name: (lambda flags=flags: _fused_call(yd, packed, th, tw, flags,
                                               **kw))
        for name, flags in ABLATE_VARIANTS})
    best = time_interleaved(fns, rounds=4, iters=6)
    print_table(f"[{mode}] tile ({th},{tw})  plane {w}x{h}"
                f"  useful {mp:.1f} MP", best, mp)
    print("\ndifferenced stage costs (ms):")
    print(f"  f1 hi/lo split: {1e3*(best['full'] - best['no-split']):7.2f}")
    print(f"  stencil       : {1e3*(best['full'] - best['no-stencil']):7.2f}")
    print(f"  conv3 matmuls : {1e3*(best['no-stencil'] - best['conv1+2']):7.2f}")
    print(f"  conv2 matmuls : {1e3*(best['conv1+2'] - best['conv1']):7.2f}")
    print(f"  rp concat     : {1e3*(best['conv1'] - best['conv1/no-concat']):7.2f}")
    print(f"  conv1 dot     : {1e3*(best['conv1/no-concat'] - best['dma+cast+cc']):7.2f}")
    print(f"  dma+cast+cc   : {1e3*best['dma+cast+cc']:7.2f}")


# ----------------------------------------------------------------- hmode


def hmode_main() -> None:
    """Dense vs phase horizontal pass, chained in-pipeline at 1080p->4K.

    The dense band's matmul cost scales with iw*ow while the phase form's
    interleave penalty scales with the output area only — the 540p A/B
    chose dense, but the crossover should flip for wider inputs.
    """
    from functools import partial

    from srcnn_cpp_tpu.ops.color import (bgr2ycrcb_u8_planar,
                                         ycrcb2bgr_u8_planar)
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8, scaled_size

    batch, h, w, iters = 8, 1080, 1920, 4
    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(w, h, 2.0)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, 3, h, w), dtype=np.uint8))

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
        {m: (lambda fn=fn: chain(fn, iters)) for m, fn in variants.items()})
    # device-side equality, scalar fetch (bulk downloads ride a ~10-30
    # MB/s tunnel and would dominate the harness wall clock)
    maxdiff = jax.jit(lambda a, b: jnp.abs(
        a.astype(jnp.int32) - b.astype(jnp.int32)).max())
    for m in ("phase",):
        assert int(maxdiff(outs["dense"], outs[m])) == 0, m

    # each thunk runs `iters` chained dispatches: rescale to per-dispatch
    best = {m: s / iters
            for m, s in time_interleaved(fns, rounds=5, iters=1).items()}
    print_table(f"[hmode] batch {batch} {w}x{h} -> x2, chained", best,
                batch * oh * ow / 1e6)


# --------------------------------------------------------------- prepost


def prepost_main(argv) -> None:
    from srcnn_cpp_tpu.ops.color import (bgr2ycrcb_u8_planar,
                                         ycrcb2bgr_u8_planar)
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8

    if not argv or argv[0] not in ("pre", "post", "preablate"):
        print(__doc__)
        return
    exp = argv[0]
    batch, h, w = 32, 540, 960
    oh, ow = 2 * h, 2 * w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, 3, h, w), dtype=np.uint8))
    mp = batch * oh * ow / 1e6
    title = f"[{exp}] batch {batch} {w}x{h} -> {ow}x{oh}, {mp:.1f} MP"

    # NOTE on the bit-checks: the diff is computed ON DEVICE and only the
    # scalar max is fetched — np.asarray(out) would pull ~200 MB per
    # variant through the ~10-30 MB/s dev tunnel and dominate the harness
    # wall clock (round-4 lesson: three sweep runs timed out on downloads).
    maxdiff = jax.jit(lambda a, b: jnp.abs(
        a.astype(jnp.int32) - b.astype(jnp.int32)).max())

    if exp == "preablate":
        # cumulative stage knockout (each adds one skipped stage); the
        # differenced table attributes the kernel's time by stage.  Only
        # "full" is bit-checked (the others compute wrong values by design).
        ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (oh, ow))
        steps = [("full", frozenset()),
                 ("-inter", frozenset({"inter"})),
                 ("-round", frozenset({"inter", "round"})),
                 ("-vpass", frozenset({"inter", "round", "v"})),
                 ("-hpass", frozenset({"inter", "round", "v", "h"})),
                 ("-color", frozenset({"inter", "round", "v", "h",
                                       "color"}))]

        def make(flags):
            from srcnn_cpp_tpu.ops.pallas_resize import (_apply_fused_pre,
                                                         _pre_statics)

            st = _pre_statics(oh, h, ow, w)
            fn = jax.jit(lambda v: _apply_fused_pre(v, oh, ow, st,
                                                    ablate=flags))
            return lambda: fn(x)

        def check(name, out):
            if name == "full":
                d = int(maxdiff(out, ref))
                print(f"compiled full: max LSB vs engine {d}", flush=True)
            else:
                print(f"compiled {name}", flush=True)

        fns, _ = compile_all({n: make(f) for n, f in steps},
                             check=check, on_fail="raise")
        best = time_interleaved(fns, rounds=5, iters=4)
        print_table(title, best, mp)
        print("\ndifferenced stage costs (ms):")
        names = [s[0] for s in steps]
        for a, b in zip(names, names[1:]):
            print(f"  {b[1:]:>6}: {1e3 * (best[a] - best[b]):7.2f}")
        print(f"  floor (dma+casts+writes): {1e3 * best[names[-1]]:7.2f}")
        return

    if exp == "pre":
        ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (oh, ow))
        # (tih, tiw) or (tih, tiw, "xla") for the out-of-kernel row
        # interleave; None = production policy.  Keep the list short —
        # each fresh variant costs a ~90 s remote compile and the harness
        # must finish inside one driver timeout (cached variants are free).
        tiles = [None, (32, 1024), (48, 1024), (64, 1024),
                 (32, 1024, "xla"), (64, 1024, "xla")]

        def make(tile):
            def _pre_tile(v):
                from srcnn_cpp_tpu.ops.pallas_resize import (
                    _apply_fused_pre, _pre_statics)

                st = _pre_statics(oh, h, ow, w)
                rowinter = tile[2] if len(tile) > 2 else "kernel"
                return _apply_fused_pre(v, oh, ow, st, tile=tile[:2],
                                        rowinter=rowinter)

            fn = jax.jit(lambda v: pre_upscale_fused(v, (oh, ow))
                         if tile is None else _pre_tile(v))
            return lambda: fn(x)
    else:
        up = jnp.asarray(rng.integers(0, 256, (batch, 3, oh, ow),
                                      dtype=np.uint8))
        y_sr = jnp.asarray(rng.integers(0, 256, (batch, oh, ow),
                                        dtype=np.uint8))
        ref = ycrcb2bgr_u8_planar(jnp.stack(
            [y_sr, up[:, 1], up[:, 2]], axis=-3))
        tiles = [None, (64, 1920), (128, 1920), (192, 1920), (256, 1920),
                 (344, 1920)]

        def make(tile):
            fn = jax.jit(lambda v: merge_ycrcb_to_bgr_fused(
                y_sr, v, tile=tile))
            return lambda: fn(up)

    def check(name, out):
        d = int(maxdiff(out, ref))
        print(f"compiled {name}: max LSB vs engine {d}", flush=True)
        assert d <= 1, (name, d)

    cases = {("policy" if t is None else "x".join(str(v) for v in t)):
             make(t) for t in tiles}
    fns, _ = compile_all(cases, check=check)
    best = time_interleaved(fns, rounds=5, iters=4)
    print_table(title, best, mp)


# --------------------------------------------------------------- prefuse


def prefuse_main() -> None:
    """Round-5 free-Y bound on the pre→conv fusion boundary (VERDICT #2).

    A/Bs the production fused pipeline against the same pipeline with the
    pre-pass's Y chains knocked out ("ych": Cr/Cb computed, Y a duplicate
    of the Cr plane — wrong values, identical shapes/layout).  The delta
    is the IN-CONTEXT cost of producing upscaled Y in the pre-pass, i.e.
    the STRICT UPPER BOUND on what fusing the bicubic into the conv
    kernel could recover: the conv kernel would still do that work on its
    own serial critical path, so the realizable gain is the delta minus
    the conv-side addition (lower-bounded by the Y phase-chain arithmetic
    ~0.75 ms, realistically ~3-4x that per the 4c VMEM-movement
    attribution) plus only the Y HBM round-trip (~0.2 ms of bandwidth).
    """
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused
    from srcnn_cpp_tpu.ops.pallas_resize import (_apply_fused_pre,
                                                 _pre_plans,
                                                 pre_upscale_fused)
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
    from srcnn_cpp_tpu.pipeline import _upscale_planar_jit

    weights = jax.device_put(load_weights())
    batch, h, w = 32, 540, 960
    oh, ow = 2 * h, 2 * w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, 3, h, w), dtype=np.uint8))
    mp = batch * oh * ow / 1e6
    statics, vcf, hcf = _pre_plans(oh, h, ow, w)
    ych = frozenset({"ych"})

    @jax.jit
    def freey(v):
        up = _apply_fused_pre(v, oh, ow, statics, ablate=ych,
                              vcf=vcf, hcf=hcf)
        y_sr = srcnn_y_fused(up[:, 0], weights)
        return merge_ycrcb_to_bgr_fused(y_sr, up)

    pre_full = jax.jit(lambda v: pre_upscale_fused(v, (oh, ow)))
    pre_noy = jax.jit(lambda v: _apply_fused_pre(
        v, oh, ow, statics, ablate=ych, vcf=vcf, hcf=hcf))
    cases = {
        "e2e-base": lambda: _upscale_planar_jit(x, weights, (oh, ow),
                                                "pallas", "fused"),
        "e2e-freeY": lambda: freey(x),
        "pre-full": lambda: pre_full(x),
        "pre-noY": lambda: pre_noy(x),
    }
    fns, _ = compile_all(cases)
    best = time_interleaved(fns, rounds=5, iters=4)
    print_table(f"[prefuse] free-Y bound, batch {batch} {w}x{h} -> "
                f"{ow}x{oh}", best, mp)
    d_e2e = 1e3 * (best["e2e-base"] - best["e2e-freeY"])
    d_pre = 1e3 * (best["pre-full"] - best["pre-noY"])
    print(f"\nY share of pre-pass, in-context (e2e delta): {d_e2e:6.2f} ms")
    print(f"Y share of pre-pass, standalone            : {d_pre:6.2f} ms")


# ------------------------------------------------------------------ main


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, argv = sys.argv[1], sys.argv[2:]
    enable_compilation_cache()
    if cmd == "kernel":
        kernel_main(argv)
    elif cmd == "ablate":
        ablate_main(argv)
    elif cmd == "hmode":
        hmode_main()
    elif cmd == "prepost":
        prepost_main(argv)
    elif cmd == "prefuse":
        prefuse_main()
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}; see --help")


if __name__ == "__main__":
    main()
