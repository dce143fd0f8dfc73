"""GSPMD auto-partitioned pipeline (the compiler-driven alternative).

`tiling.py` writes the halo exchange by hand (shard_map + ppermute) for
bit-exact control; this module expresses the same sharding declaratively —
annotate the batch/row shardings on a plain jit and let XLA's SPMD
partitioner insert the halo exchanges for the spatially-partitioned convs
itself.  Useful as:

* the idiomatic "pick a mesh, annotate, let XLA do collectives" path;
* a differential-testing oracle for the manual path (same math, two
  independent partitioners — tests compare both against the monolith);
* the variant that composes transparently with other jit code (no manual
  per-device programming).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.srcnn import srcnn_y


@partial(jax.jit, static_argnames=("mesh",))
def _gspmd_call(y, weights, mesh: Mesh):
    y = jax.lax.with_sharding_constraint(
        y, NamedSharding(mesh, P("data", "row", None)))
    out = srcnn_y(y, weights)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("data", "row", None)))


def srcnn_y_gspmd(y_u8, weights, mesh: Mesh):
    """SRCNN a Y batch ``[B, H, W]`` with XLA-partitioned spatial sharding.

    Same data layout contract as :func:`..parallel.srcnn_y_tiled`.
    Non-divisible H is replicate-padded to a shard multiple and cropped
    (with the conv3 feature-clamp bottom-rows patch, cf. upscale_y_tiled);
    B must divide by the ``data`` axis.
    """
    import numpy as np

    from ..ops.srcnn import srcnn_y

    nrow = mesh.shape["row"]
    y = np.asarray(y_u8)
    b, h, w = y.shape
    hpad = (-h) % nrow
    yp = y
    if hpad:
        yp = np.concatenate([y, np.repeat(y[:, -1:, :], hpad, axis=1)],
                            axis=1)
    dev = jax.device_put(yp, NamedSharding(mesh, P("data", "row", None)))
    out = np.array(_gspmd_call(dev, weights, mesh))[:, :h, :]
    if hpad:
        # replicate pad rows equal conv1's input clamp, so only conv3's
        # feature-level clamp (last 2 real rows) differs — recompute them
        strip = min(h, 16)
        fix = np.asarray(srcnn_y(y[:, h - strip:, :], weights))
        n_bad = min(2, h)
        out[:, h - n_bad:, :] = fix[:, strip - n_bad:, :]
    return out
