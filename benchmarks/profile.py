"""On-chip e2e profiling harness — one runner for the pipeline-level
spans (consolidates the former pipe_ablate.py, e2e_profile.py,
batch_sweep.py and resize_profile.py; historical numbers recorded under
those names in KERNEL_NOTES.md / BASELINE_MEASURED.md map to the
subcommands below).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile.py <cmd>

Subcommands:
    pipe                chained in-jit ablation of the e2e pipeline at the
        bench geometry (ex pipe_ablate.py).  Standalone per-stage
        dispatches are floored by the ~9 ms relay round-trip, so stage
        costs are attributed by DIFFERENCING chained whole-pipeline
        variants (each variant one jit, dispatches chained with a data
        dependency exactly like bench.py, interleaved best-of-N):
          full        color-in + resize(dense-h) + conv(pallas) + strips
                      + color-out
          block-h     block-banded horizontal resize pass
          phase-h     lane-phase strided-slice horizontal pass
          int-color   int32 fixed-point color (the pre-f32 form)
          no-edgefix  full minus the left/right strip recompute
          no-pack     per-frame lax.map conv (no lane packing)
          no-conv     full minus SRCNN (bicubic-only pipeline)
          fused-pre   Pallas color+bicubic pre-pass
          fused-post  Pallas merge+inverse-color post-pass
          fused-both  both Pallas passes (the --resize=fused pipeline)
    e2e                 nested spans: bare conv kernel / conv + edge fix /
        full pipeline at the bench config (ex e2e_profile.py)
    batch [HxW] [b,b,...]   batch-size sweep of the full x2 pipeline
        (ex batch_sweep.py; defaults 540x960 16,32,64; BENCH_RESIZE=exact
        for the XLA engines instead of the fused passes)
    resize              stage shares inside the resize+color bucket:
        color-in / h-pass / h+v resize / color-out (ex resize_profile.py)
    mesh [batch]        sharded pre-pass A/B on a (1, n_devices) mesh:
        fused Pallas-per-device vs the GSPMD XLA engine, x2 and x1.5
        (the scale that fell back to GSPMD before round 5)

Methodology: benchmarks/_runner.py (interleaved best-of-N in one process,
tiny-fetch completion fences — the axon relay's block_until_ready is not
a reliable barrier and bulk downloads ride a ~10-30 MB/s tunnel).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

# self-sufficient invocation: `python benchmarks/profile.py` puts
# benchmarks/ on sys.path, not the repo root the package lives in
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

BATCH = 32
H, W = 540, 960


# ------------------------------------------------------------------ pipe


def pipe_main() -> None:
    from srcnn_cpp_tpu.ops.color import (_CB2B, _CB2G, _CR2G, _CR2R, _B2Y,
                                         _G2Y, _R2Y, _R2CR, _B2CB, _DELTA,
                                         _HALF, _SHIFT, bgr2ycrcb_u8_planar,
                                         ycrcb2bgr_u8_planar)
    from srcnn_cpp_tpu.ops.pallas_srcnn import (_fused_call, _pick_tiles,
                                                _prep_weights, srcnn_y_fused)
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8, scaled_size

    iters = 6

    def _descale_i(x):
        return (x + _HALF) >> _SHIFT

    def bgr2ycrcb_int(bgr_p):
        x = bgr_p.astype(jnp.int32)
        b, g, r = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
        y = _descale_i(b * _B2Y + g * _G2Y + r * _R2Y)
        cr = _descale_i((r - y) * _R2CR + _DELTA)
        cb = _descale_i((b - y) * _B2CB + _DELTA)
        return jnp.clip(jnp.stack([y, cr, cb], axis=-3),
                        0, 255).astype(jnp.uint8)

    def ycrcb2bgr_int(ycrcb_p):
        x = ycrcb_p.astype(jnp.int32)
        y, cr, cb = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
        b = y + _descale_i((cb - 128) * _CB2B)
        g = y + _descale_i((cb - 128) * _CB2G + (cr - 128) * _CR2G)
        r = y + _descale_i((cr - 128) * _CR2R)
        return jnp.clip(jnp.stack([b, g, r], axis=-3),
                        0, 255).astype(jnp.uint8)

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
            ycc = (bgr2ycrcb_int if color == "int"
                   else bgr2ycrcb_u8_planar)(x)
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
            from srcnn_cpp_tpu.ops.pallas_merge import (
                merge_ycrcb_to_bgr_fused)

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
            chain(fn, iters)
            best[name] = min(best[name], (time.monotonic() - t0) / iters)

    mp = BATCH * oh * ow / 1e6
    print(f"\nbatch {BATCH} x {ow}x{oh} = {mp:.1f} MP/dispatch (chained)")
    for name in variants:
        print(f"{name:>11}: {best[name]*1e3:7.2f} ms"
              f"  {mp/best[name]:7.1f} MP/s")
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


# ------------------------------------------------------------------- e2e


def e2e_main() -> None:
    from srcnn_cpp_tpu.ops.pallas_srcnn import (_fused_call, _pick_tiles,
                                                _prep_weights, srcnn_y_fused)
    from srcnn_cpp_tpu.ops.resize import scaled_size
    from srcnn_cpp_tpu.pipeline import _upscale_planar_jit

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
        print(f"{name:>18}: {best[name]*1e3:8.2f} ms"
              f"  {mp/best[name]:8.1f} MP/s")
    print(f"\nedge-fix cost : "
          f"{1e3*(best['conv + edge fix'] - best['conv kernel only']):7.2f} ms")
    print(f"resize+color  : "
          f"{1e3*(best['full pipeline'] - best['conv + edge fix']):7.2f} ms")


# ----------------------------------------------------------------- batch


def batch_main(argv) -> None:
    from srcnn_cpp_tpu.ops.resize import scaled_size
    from srcnn_cpp_tpu.pipeline import _upscale_planar_jit

    iters = 4
    # resize mode for the swept pipeline (the production default is the
    # fused Pallas pre/post passes; BENCH_RESIZE=exact for the XLA engines)
    resize = os.environ.get("BENCH_RESIZE", "fused")

    hw = argv[0] if argv else "540x960"
    h, w = (int(v) for v in hw.split("x"))
    batches = [int(v) for v in
               (argv[1] if len(argv) > 1 else "16,32,64").split(",")]

    weights = jax.device_put(load_weights())
    ow, oh = scaled_size(w, h, 2.0)
    rng = np.random.default_rng(0)
    frames = {b: jnp.asarray(rng.integers(0, 256, (b, 3, h, w),
                                          dtype=np.uint8))
              for b in batches}

    def chain(b, n):
        dep = jnp.zeros((), jnp.uint8)
        out = None
        for _ in range(n):
            out = _upscale_planar_jit(frames[b].at[0, 0, 0, 0].add(dep),
                                      weights, (oh, ow), "pallas", resize)
            dep = out[0, 0, 0, 0] * 0
        # completion fence: a host fetch of a dependent scalar (the relay's
        # block_until_ready is not a reliable barrier)
        np.asarray(dep)
        return out

    for b in batches:
        chain(b, 2)
        print("compiled batch", b, flush=True)

    best = {b: float("inf") for b in batches}
    for rep in range(5):
        for b in batches:
            t0 = time.monotonic()
            chain(b, iters)
            best[b] = min(best[b], (time.monotonic() - t0) / iters)
    for b in batches:
        mp = b * oh * ow / 1e6
        print(f"batch {b:>3}: {best[b]*1e3:7.2f} ms  {mp/best[b]:7.1f} MP/s")


# ---------------------------------------------------------------- resize


def resize_main() -> None:
    from srcnn_cpp_tpu.ops.color import (bgr2ycrcb_u8_planar,
                                         ycrcb2bgr_u8_planar)
    from srcnn_cpp_tpu.ops.resize import (_hband_split, resize_bicubic_u8,
                                          scaled_size)

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
          f"{1e3*(best['h+v resize(540p)'] - best['hpass     (540p)']):7.2f}"
          f" ms")


# ------------------------------------------------------------------ mesh


def mesh_main(argv) -> None:
    """Sharded pre-pass A/B: fused Pallas-per-device vs the GSPMD engine.

    Times `pre_upscale_fused_rows` against the GSPMD-sharded XLA engine
    composition (`resize_bicubic_u8(bgr2ycrcb_u8_planar(x))` under a row
    sharding constraint) on a (data=1, row=n_devices) mesh, at x2 and
    x1.5 — the scale whose fused-sharded path existed only as a GSPMD
    fallback before round 5.  On one real chip the mesh is (1, 1) and
    this measures the per-device gap the distributed stream's ``fused``
    variant buys; on the 8-virtual-CPU mesh it exercises the multi-device
    halo plumbing (interpret-mode kernel timings are NOT meaningful
    there — use it for plumbing, not numbers).
    """
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8, scaled_size
    from srcnn_cpp_tpu.parallel import make_mesh, pre_upscale_fused_rows

    iters = 6
    batch = int(argv[0]) if argv else 32
    nrow = len(jax.devices())
    mesh = make_mesh(data=1, row=nrow)
    rng = np.random.default_rng(0)

    @partial(jax.jit, static_argnames=("out_hw",))
    def gspmd_pre(x, out_hw):
        spec = NamedSharding(mesh, P(None, None, "row", None))
        x = lax.with_sharding_constraint(x, spec)
        up = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)
        return lax.with_sharding_constraint(up, spec)

    print(f"mesh {dict(mesh.shape)}  batch {batch}  {H}x{W} input")
    for scale in (2.0, 1.5):
        ow, oh = scaled_size(W, H, scale)
        x = jnp.asarray(rng.integers(0, 256, (batch, 3, H, W),
                                     dtype=np.uint8))
        if pre_upscale_fused_rows(x, (oh, ow), mesh) is None:
            # e.g. the 8-virtual-device CPU mesh with 540 % 8 != 0
            print(f"x{scale:g}: fused path declines this mesh/geometry "
                  f"— skipping")
            continue

        # SYMMETRIC variants: both sides are one cached jit dispatch with
        # the chain dependency folded in-jit — an eager fused call would
        # re-run the numpy plan search and an eager .at[].add input copy
        # every timed iteration (harness overhead, not kernel time)
        fused_jit = jax.jit(lambda v, d, hw=(oh, ow): pre_upscale_fused_rows(
            v.at[0, 0, 0, 0].add(d), hw, mesh))
        gspmd_jit = jax.jit(lambda v, d, hw=(oh, ow): gspmd_pre(
            v.at[0, 0, 0, 0].add(d), hw))
        variants = {
            "fused-sharded": lambda d: fused_jit(x, d),
            "gspmd-engine ": lambda d: gspmd_jit(x, d),
        }

        def chain(fn, n):
            dep = jnp.zeros((), jnp.uint8)
            out = None
            for _ in range(n):
                out = fn(dep)
                dep = out[0, 0, 0, 0] * 0
            np.asarray(dep)   # completion fence (tiny fetch)
            return out

        for name, fn in variants.items():
            chain(fn, 2)
        best = {name: float("inf") for name in variants}
        for rep in range(5):
            for name, fn in variants.items():
                t0 = time.monotonic()
                chain(fn, iters)
                best[name] = min(best[name], (time.monotonic() - t0) / iters)
        mp = batch * oh * ow / 1e6
        for name in variants:
            print(f"x{scale:g} {name}: {best[name]*1e3:7.2f} ms "
                  f"{mp/best[name]:8.1f} MP/s")


# ------------------------------------------------------------------ main


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, argv = sys.argv[1], sys.argv[2:]
    enable_compilation_cache()
    if cmd == "pipe":
        pipe_main()
    elif cmd == "e2e":
        e2e_main()
    elif cmd == "batch":
        batch_main(argv)
    elif cmd == "resize":
        resize_main()
    elif cmd == "mesh":
        mesh_main(argv)
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}; see --help")


if __name__ == "__main__":
    main()
