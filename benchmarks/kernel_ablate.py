"""On-chip attribution of the fused kernel's time by stage ablation.

Runs the fused conv kernel at 4K with stages progressively disabled
(profiling-only ``ablate`` flags in ops/pallas_srcnn.py) and prints a
differenced cost table.  Variants are interleaved and best-of-N because
on-chip timings vary run to run on a shared chip (KERNEL_NOTES.md).

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_ablate.py
    ... kernel_ablate.py packed        # production batch-32 1080p composite
    ... kernel_ablate.py packed4k      # production batch-8 4K composite

Default mode is the single-plane 4K geometry (round-2 record); ``packed``
modes reproduce the PRODUCTION lane-packed composite (true_h row clamp on,
(72,3712)/(80,3712) tiles) that the pipeline actually runs — VERDICT r3
item 1 asked for stage shares at exactly this geometry.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _runner import compile_all, print_table, time_interleaved
from srcnn_cpp_tpu.ops.pallas_srcnn import _fused_call, _pick_tiles, _prep_weights
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

H, W = 2160, 3840
VARIANTS = [
    ("full", frozenset()),
    ("no-split", frozenset({"split2"})),   # conv2/3 split cost (f1 only)
    ("no-stencil", frozenset({"stencil"})),
    ("conv1+2", frozenset({"conv3"})),
    ("conv1", frozenset({"conv2"})),
    ("conv1/no-concat", frozenset({"conv2", "concat"})),
    ("dma+cast+cc", frozenset({"conv2", "concat", "c1dot"})),
]


def main() -> None:
    enable_compilation_cache()
    weights = load_weights()
    packed = jax.tree_util.tree_map(jnp.asarray, _prep_weights(weights))
    mode = sys.argv[1] if len(sys.argv) > 1 else "4k"
    kw = {}
    if mode.startswith("packed"):
        # the production lane-packed composite (srcnn_y_fused pack branch):
        # b frames concatenated on the lane axis with 4+4 replicate cols
        b, fh, fw = (8, H, W) if mode == "packed4k" else (32, 1080, 1920)
        h, w = fh, b * (fw + 8)
        kw = dict(true_h=h)
        mp = b * fh * fw / 1e6
    else:
        h, w = H, W
        mp = H * W / 1e6
    th, tw = _pick_tiles(h, w)
    hp = ((h + th - 1) // th) * th
    wp = ((w + tw - 1) // tw) * tw
    y = np.random.default_rng(0).integers(
        0, 256, (hp + 16, wp + 128), dtype=np.uint8)
    yd = jnp.asarray(y)

    fns, _ = compile_all({
        name: (lambda flags=flags: _fused_call(yd, packed, th, tw, flags,
                                               **kw))
        for name, flags in VARIANTS})
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


if __name__ == "__main__":
    main()
