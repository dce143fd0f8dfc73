"""Native C++ host runtime vs the NumPy oracle (bit-exactness gates).

Builds ``native/libsrcnn_host.so`` on first use (skipped if no toolchain).
"""

import numpy as np
import pytest

native = pytest.importorskip("srcnn_cpp_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def test_cubic_u8_bit_exact_vs_oracle():
    from srcnn_cpp_tpu.ops.resize_tables import resize_bicubic_u8_np

    rng = np.random.default_rng(0)
    for shape, out in [((384, 384), (576, 576)), ((50, 69), (75, 103)),
                       ((64, 64), (31, 47))]:
        y = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(native.resize_cubic_u8(y, out),
                              resize_bicubic_u8_np(y, out))


def test_cubic_u8_golden(butterfly_y, butterfly_yup):
    assert np.array_equal(native.resize_cubic_u8(butterfly_y, (576, 576)),
                          butterfly_yup)


def test_color_bit_exact_vs_oracle():
    from srcnn_cpp_tpu.oracle import bgr2ycrcb_u8_ref, ycrcb2bgr_u8_ref

    img = np.random.default_rng(1).integers(0, 256, (128, 77, 3), dtype=np.uint8)
    assert np.array_equal(native.bgr2ycrcb_u8(img), bgr2ycrcb_u8_ref(img))
    assert np.array_equal(native.ycrcb2bgr_u8(img), ycrcb2bgr_u8_ref(img))


def test_separable_matches_jax_engine():
    from srcnn_cpp_tpu.ops.resize import resize_separable

    x = np.random.default_rng(2).uniform(0, 255, (48, 56)).astype(np.float32)
    for m in ("box", "bilinear", "mitchell", "catmull_rom", "lanczos3",
              "cubic_matlab"):
        c = native.resize_separable_f32(x, (31, 90), m)
        j = np.asarray(resize_separable(x, (31, 90), m))
        assert np.abs(c - j).max() < 1e-3, m


def test_tick_monotonic():
    a = native.tick_ms()
    b = native.tick_ms()
    assert b >= a >= 0.0
