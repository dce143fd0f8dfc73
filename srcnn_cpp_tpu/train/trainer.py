"""Training driver: fit SRCNN on a directory of images.

    python -m srcnn_cpp_tpu.train --data Pictures/ --scale 2 --steps 200 \
        --out /tmp/srcnn_finetuned.npz [--from-pretrained] [--sharded]

Implements the reference checkpoint's own recipe (Dong et al. 2014: Y-channel
MSE on 33x33 bicubic-degraded patches) with either the single-device or the
mesh-parallel (dp x sp) step.  SGD in the 0-255 domain needs tiny learning
rates; Adam with ~1e-4-equivalent is the practical default.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..models import SRCNN
from ..weights.checkpoint import save_npz
from .data import dataset_from_dir, iterate_minibatches
from .step import make_sharded_train_step, make_train_step, shard_batch


def fit(data_dir, scale: float = 2.0, steps: int = 200, batch: int = 64,
        lr: float = 1e-4, from_pretrained: bool = True, sharded: bool = False,
        seed: int = 0, log_every: int = 20, verbose: bool = True):
    """Returns (weights, losses). Pure-Python driver around the jitted step."""
    import jax
    import optax

    model = SRCNN()
    weights = model.pretrained() if from_pretrained else model.init(
        jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    state = opt.init(weights)

    x, t = dataset_from_dir(data_dir, scale=scale)
    if verbose:
        print(f"dataset: {len(x)} patches from {data_dir}")
    if sharded:
        from ..parallel import make_mesh

        mesh = make_mesh()
        step = make_sharded_train_step(mesh, opt)
        prep = lambda a: shard_batch(mesh, a)
    else:
        step = make_train_step(opt)
        prep = lambda a: a

    losses = []
    it = iterate_minibatches(x, t, batch, seed=seed)
    for i in range(steps):
        xb, tb = next(it)
        weights, state, loss = step(weights, state, prep(xb), prep(tb))
        losses.append(float(loss))
        if verbose and (i % log_every == 0 or i == steps - 1):
            print(f"step {i:5d}  mse {losses[-1]:.3f}")
    return weights, losses


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="srcnn-train", description=__doc__)
    ap.add_argument("--data", required=True)
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="srcnn_trained.npz")
    ap.add_argument("--from-scratch", action="store_true")
    ap.add_argument("--sharded", action="store_true")
    args = ap.parse_args(argv)
    weights, losses = fit(args.data, scale=args.scale, steps=args.steps,
                          batch=args.batch, lr=args.lr,
                          from_pretrained=not args.from_scratch,
                          sharded=args.sharded)
    save_npz(args.out, weights)
    print(f"final mse {losses[-1]:.3f} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
