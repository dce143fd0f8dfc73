"""Parallelism over TPU device meshes.

The reference's only parallelism is OpenMP row-loops in one process
(SURVEY.md §2 C16-C18).  The TPU-native counterparts here:

* :mod:`.mesh` — device mesh construction (data x spatial axes).
* :mod:`.tiling` — spatial row-tile sharding of one image across chips with
  bit-exact halo exchange over ICI (``lax.ppermute`` inside ``shard_map``),
  the image-domain analogue of sequence/context parallelism.
* batch data-parallelism falls out of the same mesh (batch axis sharded over
  the ``data`` axis).
"""

from .mesh import make_mesh
from .tiling import srcnn_y_tiled, upscale_y_tiled

__all__ = ["make_mesh", "srcnn_y_tiled", "upscale_y_tiled"]
