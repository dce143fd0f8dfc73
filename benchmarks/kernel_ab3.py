"""On-chip A/B round 2c: rows-per-block (rpb) lane batching.

``rpb=2`` lane-concatenates two feature rows per iteration so the dots see
N=2*tw4 and every elementwise/split/concat op issues once per pair —
attacking the per-row VPU op-issue overhead (KERNEL_NOTES round-2 cost
model: ~3.9 us/row vs ~2.1 us of pure MXU).  Bit-exact by construction
(same dots, wider N).  v3-64x3840 rpb=1 is the cross-process anchor.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_ab3.py
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
    cases = [
        ("r1-64x3840", 64, 3840, 1),
        ("r2-64x960", 64, 960, 2),
        ("r2-64x1280", 64, 1280, 2),
        ("r4-64x640", 64, 640, 4),
        ("r2-32x1280", 32, 1280, 2),
    ]
    fns, outs = {}, {}
    for name, th, tw, rpb in cases:
        hp = ((H + th - 1) // th) * th
        wp = ((W + tw - 1) // tw) * tw
        y = jnp.asarray(np.pad(base, ((0, hp + 16 - H), (0, wp + 128 - W)),
                               mode="edge"))
        fns[name] = (lambda y=y, th=th, tw=tw, rpb=rpb:
                     _fused_call(y, pk, th, tw, rpb=rpb))
        try:
            out = fns[name]()
            np.asarray(out[:2, :2])
        except Exception as e:
            print(f"compile FAILED {name}: {type(e).__name__}", flush=True)
            fns.pop(name)
            continue
        outs[name] = out
        print(f"compiled {name}", flush=True)

    a = np.asarray(outs["r1-64x3840"])[:H, :W]
    for name in outs:
        if name == "r1-64x3840":
            continue
        b = np.asarray(outs[name])[:H, :W]
        print(f"bit-check r1 vs {name}: max LSB "
              f"{np.abs(a.astype(int) - b.astype(int)).max()}", flush=True)

    best = {n: float("inf") for n in fns}
    for rep in range(5):
        for name, fn in fns.items():
            t0 = time.monotonic()
            for _ in range(4):
                out = fn()
            np.asarray(out[:2, :2])
            best[name] = min(best[name], (time.monotonic() - t0) / 4)
    mp = H * W / 1e6
    print(f"\n{'variant':>16}  {'ms':>8}  {'MP/s':>8}")
    for name in fns:
        print(f"{name:>16}  {best[name]*1e3:8.2f}  {mp/best[name]:8.1f}")


if __name__ == "__main__":
    main()
