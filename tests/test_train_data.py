"""Training data pipeline + end-to-end fit smoke (tiny)."""

import numpy as np
import pytest


def test_patches_shapes_and_alignment():
    from srcnn_cpp_tpu.train.data import patches_from_image

    # smooth structured content (noise wouldn't survive the downscale)
    yy, xx = np.indices((80, 96)).astype(np.float64)
    base = (127 + 100 * np.sin(yy / 9) * np.cos(xx / 7)).astype(np.uint8)
    bgr = np.stack([base, base, base], -1)
    x, t = patches_from_image(bgr, scale=2.0, patch=33, stride=20)
    assert x.shape == t.shape and x.shape[1:] == (33, 33)
    assert len(x) > 0
    # degraded input correlates strongly with target (same content)
    c = np.corrcoef(x[0].ravel().astype(float), t[0].ravel().astype(float))[0, 1]
    assert c > 0.9


def test_fit_reduces_loss_on_tiny_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from srcnn_cpp_tpu.train.trainer import fit

    rng = np.random.default_rng(1)
    for i in range(2):
        img = rng.integers(0, 256, (66, 66, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f"im{i}.png"), img)
    w, losses = fit(tmp_path, scale=2.0, steps=8, batch=8, lr=1e-4,
                    verbose=False)
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]


def test_sniff_format(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from srcnn_cpp_tpu.imageio import sniff_format

    img = np.zeros((8, 8, 3), np.uint8)
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.jpg"
    cv2.imwrite(str(p1), img)
    cv2.imwrite(str(p2), img)
    assert sniff_format(p1) == "png"
    assert sniff_format(p2) == "jpeg"
    assert sniff_format(tmp_path / "missing.x") is None
