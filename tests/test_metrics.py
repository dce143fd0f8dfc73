"""PSNR/SSIM metric correctness (the eval protocol's measuring sticks).

The reference publishes no metrics code; these implement the standard
SRCNN evaluation protocol (reference Pictures/Resize.m + README.md:34-45
before/after pairs), so they are validated against first principles and a
brute-force SSIM oracle rather than reference goldens.
"""

import numpy as np
import pytest

from srcnn_cpp_tpu.utils.metrics import _gaussian_kernel, psnr, ssim


def test_psnr_identity_and_known_value():
    x = np.arange(100, dtype=np.float64).reshape(10, 10)
    assert psnr(x, x) == float("inf")
    # uniform +5 error: PSNR = 10 log10(255^2 / 25)
    assert psnr(x, x + 5.0) == pytest.approx(10 * np.log10(255**2 / 25.0))


def test_psnr_is_symmetric():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (17, 23))
    b = rng.uniform(0, 255, (17, 23))
    assert psnr(a, b) == pytest.approx(psnr(b, a))


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (48, 48))
    assert ssim(x, x) == pytest.approx(1.0)
    # more noise -> lower SSIM
    n = rng.normal(0, 1, x.shape)
    s_small = ssim(x, np.clip(x + 4 * n, 0, 255))
    s_large = ssim(x, np.clip(x + 24 * n, 0, 255))
    assert 0 < s_large < s_small < 1


def _ssim_bruteforce(a, b, peak=255.0, size=11, sigma=1.5):
    """Direct windowed SSIM: explicit 2-D Gaussian window per output pixel."""
    k1 = _gaussian_kernel(size, sigma)
    w = np.outer(k1, k1)  # normalized 2-D window
    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
    oh, ow = a.shape[0] - size + 1, a.shape[1] - size + 1
    vals = np.empty((oh, ow))
    for i in range(oh):
        for j in range(ow):
            pa = a[i:i + size, j:j + size]
            pb = b[i:i + size, j:j + size]
            mu_a, mu_b = (w * pa).sum(), (w * pb).sum()
            va = (w * pa * pa).sum() - mu_a**2
            vb = (w * pb * pb).sum() - mu_b**2
            vab = (w * pa * pb).sum() - mu_a * mu_b
            vals[i, j] = ((2 * mu_a * mu_b + c1) * (2 * vab + c2)) / (
                (mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    return float(vals.mean())


def test_ssim_matches_bruteforce_oracle():
    # validates the separable filtering + 'valid' cropping end to end
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 255, (20, 26))
    b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
    assert ssim(a, b) == pytest.approx(_ssim_bruteforce(a, b), abs=1e-12)


def test_eval_suite_row_schema_has_ssim():
    # the EVAL.md renderer consumes these keys; keep harness + renderer in sync
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "eval_suite", Path(__file__).parent.parent / "benchmarks" / "eval_suite.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = [{"image": "x", "scale": 2.0, "psnr_ours": 30.0, "psnr_ref": 30.0,
             "delta_psnr": 0.0, "ssim_ours": 0.9, "ssim_ref": 0.9,
             "delta_ssim": 0.0, "max_lsb_vs_ref": 1}]
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out = Path(td) / "EVAL.md"
        mod.render_md(rows, "pallas", "cpu", out)
        text = out.read_text()
    assert "ΔSSIM" in text and "0.90000" in text and "PASS" in text
