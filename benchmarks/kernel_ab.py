"""On-chip A/B: 8-matmul kernel vs stacked-matmul kernel, with tile sweep.

Interleaved best-of-N (shared chip, ±2x run-to-run variance — see
KERNEL_NOTES.md).  Also bit-checks stacked vs unstacked output at 4K.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from srcnn_cpp_tpu.ops.pallas_srcnn import _fused_call, _prep_weights
from srcnn_cpp_tpu.runtime import enable_compilation_cache
from srcnn_cpp_tpu.weights import load_weights

H, W = 2160, 3840
TILES = [(16, 640), (24, 640), (32, 640), (16, 768), (32, 512)]


def main() -> None:
    enable_compilation_cache()
    weights = load_weights()
    pk_old = jax.tree_util.tree_map(
        jnp.asarray, _prep_weights(weights, stacked=False))
    pk_new = jax.tree_util.tree_map(
        jnp.asarray, _prep_weights(weights, stacked=True))

    rng = np.random.default_rng(0)
    fns, outs = {}, {}
    for th, tw in TILES:
        hp = ((H + th - 1) // th) * th
        wp = ((W + tw - 1) // tw) * tw
        y = jnp.asarray(rng.integers(
            0, 256, (hp + 16, wp + 128), dtype=np.uint8))
        for tag, pk in (("old", pk_old), ("new", pk_new)):
            if tag == "old" and (th, tw) != (16, 640):
                continue  # old kernel only at its production tile
            name = f"{tag}-{th}x{tw}"
            fns[name] = (lambda y=y, pk=pk, th=th, tw=tw:
                         _fused_call(y, pk, th, tw))
            out = fns[name]()
            np.asarray(out[:2, :2])  # compile + fence (relay-safe)
            outs[name] = (out, H, W)
            print(f"compiled {name}", flush=True)

    a = np.asarray(outs["old-16x640"][0])[:H, :W]
    b = np.asarray(outs["new-16x640"][0])[:H, :W]
    print(f"bit-check old vs new @16x640: max LSB "
          f"{np.abs(a.astype(int) - b.astype(int)).max()}", flush=True)

    best = {name: float("inf") for name in fns}
    for rep in range(4):
        for name in fns:
            t0 = time.monotonic()
            n = 6
            for _ in range(n):
                out = fns[name]()
            np.asarray(out[:2, :2])
            best[name] = min(best[name], (time.monotonic() - t0) / n)

    mp = H * W / 1e6
    print(f"\nplane {W}x{H} = {mp:.1f} MP (kernel-only, includes pad strips)")
    print(f"{'variant':>16}  {'ms':>8}  {'MP/s':>8}")
    for name in fns:
        print(f"{name:>16}  {best[name]*1e3:8.2f}  {mp/best[name]:8.1f}")


if __name__ == "__main__":
    main()
