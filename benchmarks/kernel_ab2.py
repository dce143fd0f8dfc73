"""On-chip A/B round 2: stacked kernel with kx-major stencil, ± dbuf DMA.

``old`` (the 8-matmul kernel) is included as a cross-process anchor so the
numbers can be compared against kernel_ab.py's run despite chip variance.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_ab2.py
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


def main() -> None:
    enable_compilation_cache()
    weights = load_weights()
    pk_old = jax.tree_util.tree_map(
        jnp.asarray, _prep_weights(weights, stacked=False))
    pk_new = jax.tree_util.tree_map(
        jnp.asarray, _prep_weights(weights, stacked=True))

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W), dtype=np.uint8)  # ONE image for all
    cases = [
        ("old-16x640", pk_old, 16, 640, False),
        ("v3-64x1920", pk_new, 64, 1920, True),
        ("v3-64x3840", pk_new, 64, 3840, True),
    ]
    fns, outs = {}, {}
    for name, pk, th, tw, dbuf in cases:
        hp = ((H + th - 1) // th) * th
        wp = ((W + tw - 1) // tw) * tw
        y = jnp.asarray(np.pad(base, ((0, hp + 16 - H), (0, wp + 128 - W)),
                               mode="edge"))
        fns[name] = (lambda y=y, pk=pk, th=th, tw=tw, dbuf=dbuf:
                     _fused_call(y, pk, th, tw, dbuf=dbuf))
        out = fns[name]()
        np.asarray(out[:2, :2])
        outs[name] = out
        print(f"compiled {name}", flush=True)

    a = np.asarray(outs["old-16x640"])[:H, :W]
    for name in outs:
        if name == "old-16x640":
            continue
        b = np.asarray(outs[name])[:H, :W]
        print(f"bit-check old vs {name}: max LSB "
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
    print(f"\nplane {W}x{H} = {mp:.1f} MP (kernel-only)")
    print(f"{'variant':>16}  {'ms':>8}  {'MP/s':>8}")
    for name in fns:
        print(f"{name:>16}  {best[name]*1e3:8.2f}  {mp/best[name]:8.1f}")


if __name__ == "__main__":
    main()
