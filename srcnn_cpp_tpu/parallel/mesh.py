"""Device-mesh construction helpers.

Axes convention (used across the framework):

* ``data``  — batch data-parallel axis (frames/images per device group);
* ``row``   — spatial axis: image rows sharded across devices, stitched with
  halo exchange (:mod:`.tiling`).

On a multi-host slice, build with ``jax.distributed.initialize()`` done by
the caller first; mesh construction itself is identical.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int | None = None, row: int | None = None,
              col: int = 1, devices=None) -> Mesh:
    """Build a ``(data, row, col)`` mesh over the available devices.

    With no arguments, puts every device on the ``row`` axis (pure spatial
    tiling).  One of ``data``/``row`` may be None, in which case it is
    inferred; the axis sizes must multiply to the device count.  ``col``
    shards image columns for 2-D spatial tiling (halo exchange on both
    axes).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None and row is None:
        data, row = 1, n // col
    elif data is None:
        data = n // (row * col)
    elif row is None:
        row = n // (data * col)
    if data * row * col != n:
        raise ValueError(f"mesh {data}x{row}x{col} != {n} devices")
    arr = np.asarray(devices).reshape(data, row, col)
    return Mesh(arr, ("data", "row", "col"))
