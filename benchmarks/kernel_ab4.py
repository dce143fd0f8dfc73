"""On-chip A/B round 2d: interior block-stencil accumulation.

conv3 taps are now ordered kx-major with ky reversed per block, so t5 row r
is the feature row's contribution to output row rf-4+r — for interior
feature rows the 5 scatter-row adds collapse into ONE contiguous (5, tw)
block add.  ``ablate={"rowstencil"}`` keeps the per-row scatter (the old
path, bit-identical) for the A/B.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_ab4.py
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
    pk = jax.tree_util.tree_map(
        jnp.asarray, _prep_weights(weights, stacked=True))

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W), dtype=np.uint8)  # ONE image for all
    th, tw = 64, 3840
    hp = ((H + th - 1) // th) * th
    wp = ((W + tw - 1) // tw) * tw
    y = jnp.asarray(np.pad(base, ((0, hp + 16 - H), (0, wp + 128 - W)),
                           mode="edge"))
    cases = [
        ("row-stencil", frozenset({"rowstencil"})),
        ("block-stencil", frozenset()),
        ("block+clamp", None),  # true_h set: the production config
    ]
    fns, outs = {}, {}
    for name, ab in cases:
        kw = dict(true_h=H) if ab is None else dict(ablate=ab)
        fns[name] = lambda kw=kw: _fused_call(y, pk, th, tw, **kw)
        out = fns[name]()
        np.asarray(out[:2, :2])
        outs[name] = out
        print(f"compiled {name}", flush=True)

    a = np.asarray(outs["row-stencil"][:H, :W]).astype(int)
    b = np.asarray(outs["block-stencil"][:H, :W]).astype(int)
    print("max LSB row vs block:", np.abs(a - b).max(), flush=True)

    best = {name: float("inf") for name in fns}
    for rep in range(5):
        for name, fn in fns.items():
            t0 = time.monotonic()
            n = 6
            for _ in range(n):
                out = fn()
            np.asarray(out[:2, :2])
            best[name] = min(best[name], (time.monotonic() - t0) / n)
    mp = H * W / 1e6
    for name in fns:
        print(f"{name:>14}: {best[name]*1e3:7.2f} ms  "
              f"{mp/best[name]:7.1f} MP/s")


if __name__ == "__main__":
    main()
