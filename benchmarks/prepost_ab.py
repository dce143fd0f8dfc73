"""On-chip tile sweep for the fused pre/post Pallas passes.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prepost_ab.py pre
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prepost_ab.py post
    ... prepost_ab.py preablate    # cumulative stage ablation of the
                                   # pre-pass kernel (round-4 attribution)

Sweeps the (tih, tiw) / (th, tw) tile policies of
``ops/pallas_resize._apply_fused_pre`` and
``ops/pallas_merge.merge_ycrcb_to_bgr_fused`` at the bench geometry
(batch-32 960x540 -> x2).  Methodology: benchmarks/_runner.py (interleaved
best-of-N in one process, tiny-fetch fences, per-variant compile-failure
tolerance), plus a bit-check of every non-ablate variant against the XLA
engine before timing.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _runner import compile_all, print_table, time_interleaved
from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar, ycrcb2bgr_u8_planar
from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused
from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused
from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights  # noqa: F401  (cache warmup)

BATCH = 32
H, W = 540, 960
OH, OW = 2 * H, 2 * W


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("pre", "post", "preablate"):
        print(__doc__)
        return
    exp = sys.argv[1]
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (BATCH, 3, H, W), dtype=np.uint8))
    mp = BATCH * OH * OW / 1e6
    title = f"[{exp}] batch {BATCH} {W}x{H} -> {OW}x{OH}, {mp:.1f} MP"

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
        ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (OH, OW))
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

            st = _pre_statics(OH, H, OW, W)
            fn = jax.jit(lambda v: _apply_fused_pre(v, OH, OW, st,
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
        ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (OH, OW))
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

                st = _pre_statics(OH, H, OW, W)
                rowinter = tile[2] if len(tile) > 2 else "kernel"
                return _apply_fused_pre(v, OH, OW, st, tile=tile[:2],
                                        rowinter=rowinter)

            fn = jax.jit(lambda v: pre_upscale_fused(v, (OH, OW))
                         if tile is None else _pre_tile(v))
            return lambda: fn(x)
    else:
        up = jnp.asarray(rng.integers(0, 256, (BATCH, 3, OH, OW),
                                      dtype=np.uint8))
        y_sr = jnp.asarray(rng.integers(0, 256, (BATCH, OH, OW),
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


if __name__ == "__main__":
    main()
