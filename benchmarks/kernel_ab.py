"""On-chip kernel A/B harness — one parameterized runner for every
fused-kernel experiment of rounds 1-2 (formerly kernel_ab{,2,3,4,5}.py;
all historical numbers are recorded in KERNEL_NOTES.md).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_ab.py <exp>

Experiments:
    stacked   8-matmul kernel vs block-stacked kernel, single-4K tile sweep
    dbuf      double-buffered slab DMA on/off
    rpb       rows-per-block lane batching (1/2/4)
    stencil   per-row scatter vs contiguous block stencil (+ row clamp)
    packed    tile sweep at the lane-packed batch geometry (add "4k" for
              the 8x4K packing instead of 32x1080p)
    layout    per-stage matmul-structure candidates (c1m/c1two/c2dots/
              c3dots, see _prep_weights) at the production packed geometry
              (add "4k" for the 8x4K packing)
    quant     in-kernel u8 quantization vs the f32-out + XLA quantize pass
              at the production packed geometry

Methodology (axon relay): interleaved best-of-N per variant in one
process (shared chip, +-2x run-to-run variance), completion fenced with a
tiny host fetch, compile failures tolerated per variant.  Every variant is
bit-checked against the experiment's anchor before timing.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _runner import compile_all, print_table, time_interleaved
from srcnn_cpp_tpu.ops.pallas_srcnn import _fused_call, _prep_weights
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

H4K, W4K = 2160, 3840


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


def _experiment(name: str):
    """-> (plane_hw, halo, mp, cases); each case is (name, pk_tag, th, tw,
    kwargs)."""
    if name == "packed":
        b, h, w = (8, H4K, W4K) if "4k" in sys.argv[2:] else (32, 1080, 1920)
        wc = b * (w + 8)
        cases = [(f"{th}x{tw}-r{rpb}", "new", th, tw,
                  dict(true_h=h, rpb=rpb))
                 for th, tw, rpb in [(64, 3712, 1), (72, 3712, 1),
                                     (80, 3712, 1), (64, 1856, 2),
                                     (32, 3712, 1), (64, 2560, 1)]]
        return (h, wc), True, b * h * w / 1e6, cases
    if name == "quant":
        b, h, w = (8, H4K, W4K) if "4k" in sys.argv[2:] else (32, 1080, 1920)
        wc = b * (w + 8)
        th = 80 if "4k" in sys.argv[2:] else 72
        cases = [("quant-kernel", "new", th, 3712,
                  dict(true_h=h, quant=True)),
                 ("quant-xla", "new", th, 3712,
                  dict(true_h=h, quant=False))]
        return (h, wc), True, b * h * w / 1e6, cases
    if name == "layout":
        b, h, w = (8, H4K, W4K) if "4k" in sys.argv[2:] else (32, 1080, 1920)
        wc = b * (w + 8)
        th = 80 if "4k" in sys.argv[2:] else 72
        layouts = (["base", "c2m", "c2b", "c3m", "c2m+c3m", "c2b+c3m"]
                   if "m" in sys.argv[2:] else
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
        raise SystemExit(f"unknown experiment {name!r}; see --help")
    return (H4K, W4K), False, mp, cases


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return
    exp = sys.argv[1]
    (h, w), halo, mp, cases = _experiment(exp)

    enable_compilation_cache()
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


if __name__ == "__main__":
    main()
