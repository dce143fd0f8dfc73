"""Colorspace conversion: JAX engine vs NumPy oracle vs cv2 (when present)."""

import numpy as np
import pytest

from srcnn_cpp_tpu.oracle import bgr2ycrcb_u8_ref, ycrcb2bgr_u8_ref


def _rand_u8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_jax_matches_oracle_forward():
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8

    img = _rand_u8((257, 131, 3))
    assert np.array_equal(np.asarray(bgr2ycrcb_u8(img)), bgr2ycrcb_u8_ref(img))


def test_jax_matches_oracle_inverse():
    from srcnn_cpp_tpu.ops.color import ycrcb2bgr_u8

    img = _rand_u8((64, 99, 3), seed=3)
    assert np.array_equal(np.asarray(ycrcb2bgr_u8(img)), ycrcb2bgr_u8_ref(img))


def test_oracle_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    img = _rand_u8((512, 512, 3), seed=1)
    assert np.array_equal(
        bgr2ycrcb_u8_ref(img), cv2.cvtColor(img, cv2.COLOR_BGR2YCrCb))
    ycc = _rand_u8((512, 512, 3), seed=2)
    assert np.array_equal(
        ycrcb2bgr_u8_ref(ycc), cv2.cvtColor(ycc, cv2.COLOR_YCrCb2BGR))


def test_golden_y_plane(butterfly_bgr, butterfly_y):
    # The Y plane extracted by the reference binary's cvtColor+split
    # (srcnn.cpp:509,540), minted as a fixture on this host.
    mine = bgr2ycrcb_u8_ref(butterfly_bgr)[..., 0]
    assert np.array_equal(mine, butterfly_y)


def test_extremes_roundtrip_stability():
    # Saturation: corners of the cube convert and clamp without wrapping.
    corners = np.array(
        [[[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0], [0, 0, 255]]],
        dtype=np.uint8,
    )
    out = bgr2ycrcb_u8_ref(corners)
    assert out.dtype == np.uint8
    back = ycrcb2bgr_u8_ref(out)
    # YCrCb->BGR->YCrCb of achromatic pixels is identity.
    assert np.array_equal(back[0, 0], corners[0, 0])
    assert np.array_equal(back[0, 1], corners[0, 1])


def test_planar_variants_match_interleaved():
    from srcnn_cpp_tpu.ops.color import (bgr2ycrcb_u8, bgr2ycrcb_u8_planar,
                                         ycrcb2bgr_u8, ycrcb2bgr_u8_planar)
    img = _rand_u8((2, 37, 53, 3), seed=11)
    planar = np.moveaxis(img, -1, 1)
    a = np.asarray(bgr2ycrcb_u8(img))
    b = np.moveaxis(np.asarray(bgr2ycrcb_u8_planar(planar)), 1, -1)
    assert np.array_equal(a, b)
    a2 = np.asarray(ycrcb2bgr_u8(img))
    b2 = np.moveaxis(np.asarray(ycrcb2bgr_u8_planar(planar)), 1, -1)
    assert np.array_equal(a2, b2)
