"""Training data: LR/HR patch pairs per the SRCNN recipe.

The reference ships no trainer; its checkpoint came from the Dong et al.
2014 recipe — sub-images cropped from ground truth, degraded by bicubic
downscale (MATLAB imresize kernel) and re-upscaled, regressed to the HR
crop.  This module reproduces that data pipeline on the Y channel in the
0-255 domain the reference weights use.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..imageio import imread_bgr
from ..oracle import bgr2ycrcb_u8_ref
from ..ops.resize_tables import resize_bicubic_u8_np


def _degrade_y(y: np.ndarray, scale: float) -> np.ndarray:
    """GT Y -> bicubic-degraded, re-upscaled Y (same size), uint8.

    Degradation uses the anti-aliased Keys a=-0.5 kernel (imresize
    semantics, reference Pictures/Resize.m); the re-upscale uses the
    pipeline's OpenCV-exact bicubic, i.e. exactly what inference sees.
    """
    from ..ops.resize import resize_separable

    h, w = y.shape
    lh, lw = int(round(h / scale)), int(round(w / scale))
    lr = np.clip(np.round(np.asarray(resize_separable(
        y.astype(np.float32), (lh, lw), "cubic_matlab"))), 0, 255
    ).astype(np.uint8)
    return resize_bicubic_u8_np(lr, (h, w))


def patches_from_image(bgr: np.ndarray, scale: float = 2.0,
                       patch: int = 33, stride: int = 14,
                       rng: np.random.Generator | None = None,
                       max_patches: int | None = None):
    """(lr_up_patches, hr_patches) uint8 [N, patch, patch] from one image."""
    y = bgr2ycrcb_u8_ref(bgr)[..., 0]
    h, w = y.shape
    ch = int(h // scale * scale)
    cw = int(w // scale * scale)
    y = y[:ch, :cw]
    lr_up = _degrade_y(y, scale)
    xs, ys_ = [], []
    for r in range(0, ch - patch + 1, stride):
        for c in range(0, cw - patch + 1, stride):
            xs.append(lr_up[r:r + patch, c:c + patch])
            ys_.append(y[r:r + patch, c:c + patch])
    x = np.stack(xs) if xs else np.zeros((0, patch, patch), np.uint8)
    t = np.stack(ys_) if ys_ else np.zeros((0, patch, patch), np.uint8)
    if rng is not None:
        perm = rng.permutation(len(x))
        x, t = x[perm], t[perm]
    if max_patches is not None:
        x, t = x[:max_patches], t[:max_patches]
    return x, t


def dataset_from_dir(path, scale: float = 2.0, patch: int = 33,
                     stride: int = 14, seed: int = 0,
                     max_patches_per_image: int | None = None):
    """Concatenate patch pairs over every readable image under ``path``."""
    rng = np.random.default_rng(seed)
    xs, ts = [], []
    for f in sorted(Path(path).iterdir()):
        if f.suffix.lower() not in {".png", ".jpg", ".jpeg", ".bmp"}:
            continue
        bgr = imread_bgr(f)
        if bgr is None:
            continue
        x, t = patches_from_image(bgr, scale, patch, stride, rng,
                                  max_patches_per_image)
        xs.append(x)
        ts.append(t)
    if not xs:
        raise ValueError(f"no readable images under {path}")
    return np.concatenate(xs), np.concatenate(ts)


def iterate_minibatches(x: np.ndarray, t: np.ndarray, batch: int,
                        seed: int = 0, epochs: int | None = None):
    """Shuffled minibatch generator over patch pairs."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        perm = rng.permutation(len(x))
        for i in range(0, len(x) - batch + 1, batch):
            sel = perm[i:i + batch]
            yield x[sel], t[sel]
        epoch += 1
