"""Named production configurations (the BASELINE.json workload suite).

Three deployment shapes the framework is sized for, with the knobs that
matter pre-picked.  Each returns a callable runner; all share the planar
jitted pipeline underneath.

* ``batch_1080p_to_4k`` — throughput batches of 1080p-class frames x2
  (bench.py's headline config is the single-chip instance of this; on a
  mesh the batch shards over the ``data`` axis);
* ``single_8k`` — one very large frame (e.g. 4K->8K), spatially tiled
  across the mesh via halo exchange when one is provided;
* ``stream_4k30`` — the streaming config: frames in flight with host I/O
  overlapped (see stream.StreamUpscaler).
"""

from __future__ import annotations

import numpy as np

from .weights import SRCNNWeights, load_weights


def batch_1080p_to_4k(weights: SRCNNWeights | None = None, batch: int = 32,
                      kernel: str = "pallas", resize: str = "fast"):
    """Runner: BGR uint8 [B,H,W,3] -> upscaled x2, tuned for throughput."""
    from .pipeline import upscale_bgr_batch

    weights = weights if weights is not None else load_weights()

    def run(frames: np.ndarray):
        assert frames.ndim == 4, "expect [B, H, W, 3]"
        return upscale_bgr_batch(frames, 2.0, weights, kernel=kernel,
                                 resize=resize)

    run.batch = batch
    return run


def single_8k(weights: SRCNNWeights | None = None, mesh=None,
              scale: float = 2.0):
    """Runner: one huge frame; rows tile over the mesh when given."""
    weights = weights if weights is not None else load_weights()

    def run(bgr: np.ndarray):
        if mesh is None:
            from .pipeline import upscale_bgr

            return np.asarray(upscale_bgr(bgr, scale, weights))
        # mesh path: bicubic + color on chip 0, conv tiled over the mesh
        from .oracle import bgr2ycrcb_u8_ref, ycrcb2bgr_u8_ref
        from .ops.resize import scaled_size
        from .ops.resize_tables import resize_bicubic_u8_np
        from .parallel import upscale_y_tiled

        h, w = bgr.shape[:2]
        ow, oh = scaled_size(w, h, scale)
        ycc = bgr2ycrcb_u8_ref(bgr)
        up = np.stack([resize_bicubic_u8_np(ycc[..., i], (oh, ow))
                       for i in range(3)], axis=-1)
        y_sr = upscale_y_tiled(up[..., 0], weights, mesh)
        merged = np.stack([y_sr, up[..., 1], up[..., 2]], axis=-1)
        return ycrcb2bgr_u8_ref(merged)

    return run


def stream_4k30(weights: SRCNNWeights | None = None, scale: float = 2.0,
                depth: int = 3, kernel: str = "pallas"):
    """Runner: the pipelined video upscaler (push/drain protocol)."""
    from .stream import StreamUpscaler

    return StreamUpscaler(scale, weights=weights, kernel=kernel, depth=depth)
