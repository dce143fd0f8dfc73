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
              devices=None) -> Mesh:
    """Build a ``(data, row)`` mesh over the available devices.

    With no arguments, puts every device on the ``row`` axis (pure spatial
    tiling).  Exactly one of ``data``/``row`` may be None, in which case it
    is inferred; both given must multiply to the device count.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None and row is None:
        data, row = 1, n
    elif data is None:
        data = n // row
    elif row is None:
        row = n // data
    if data * row != n:
        raise ValueError(f"mesh {data}x{row} != {n} devices")
    arr = np.asarray(devices).reshape(data, row)
    return Mesh(arr, ("data", "row"))
