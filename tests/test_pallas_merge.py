"""Fused merge+YCrCb->BGR post-pass kernel: bit equality vs the XLA path.

Unlike the pre-pass (see test_pallas_resize.py), the inverse color
transform is integer-exact in f32 on every backend — no FMA-contraction
rounding hazard — so these tests assert full bit equality even on CPU
(interpret mode).
"""

import numpy as np
import pytest


def _ref(y_sr, up):
    import jax.numpy as jnp

    from srcnn_cpp_tpu.ops.color import ycrcb2bgr_u8_planar

    merged = jnp.stack([jnp.asarray(y_sr), jnp.asarray(up[:, 1]),
                        jnp.asarray(up[:, 2])], axis=-3)
    return np.asarray(ycrcb2bgr_u8_planar(merged))


@pytest.mark.parametrize("b,oh,ow", [
    (2, 64, 128), (1, 40, 256), (3, 136, 1920),
])
def test_merge_fused_bit_equal(b, oh, ow):
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused

    rng = np.random.default_rng(oh + ow)
    y_sr = rng.integers(0, 256, (b, oh, ow), dtype=np.uint8)
    up = rng.integers(0, 256, (b, 3, oh, ow), dtype=np.uint8)
    got = merge_ycrcb_to_bgr_fused(y_sr, up)
    assert got is not None
    assert np.array_equal(np.asarray(got), _ref(y_sr, up))


def test_merge_fused_full_u8_range_rows():
    # exercise every (y, cr) and (y, cb) pair on clip boundaries: extreme
    # chroma drives b/g/r far outside [0, 255]
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused

    y = np.tile(np.arange(256, dtype=np.uint8), (1, 8, 1))
    for cr, cb in [(0, 0), (255, 255), (0, 255), (255, 0), (128, 128)]:
        up = np.empty((1, 3, 8, 256), dtype=np.uint8)
        up[:, 1] = cr
        up[:, 2] = cb
        got = merge_ycrcb_to_bgr_fused(y, up)
        assert got is not None
        assert np.array_equal(np.asarray(got), _ref(y, up)), (cr, cb)


@pytest.mark.parametrize("b,oh,ow", [
    (1, 64, 576),    # ragged lane blocks (576 = 4.5 x 128): butterfly x1.5
    (1, 12, 128),    # ragged row block
    (2, 537, 1111),  # ragged both axes, odd sizes
])
def test_merge_fused_ragged_geometry_bit_equal(b, oh, ow):
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused

    rng = np.random.default_rng(3 * oh + ow)
    y_sr = rng.integers(0, 256, (b, oh, ow), dtype=np.uint8)
    up = rng.integers(0, 256, (b, 3, oh, ow), dtype=np.uint8)
    got = merge_ycrcb_to_bgr_fused(y_sr, up)
    assert got is not None
    assert np.array_equal(np.asarray(got), _ref(y_sr, up))


def test_merge_fused_declines_tiny_planes():
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused

    y = np.zeros((1, 64, 96), dtype=np.uint8)
    up = np.zeros((1, 3, 64, 96), dtype=np.uint8)
    assert merge_ycrcb_to_bgr_fused(y, up) is None
    y = np.zeros((1, 4, 128), dtype=np.uint8)
    up = np.zeros((1, 3, 4, 128), dtype=np.uint8)
    assert merge_ycrcb_to_bgr_fused(y, up) is None


@pytest.mark.parametrize("b,h,w", [(2, 48, 200), (1, 64, 96), (3, 41, 130)])
def test_srcnn_merge_fused_bit_equal(weights, b, h, w):
    # round-4e: conv + quantize + merge + inverse color in ONE kernel —
    # bit-identical to the separate srcnn_y_fused + merge composition
    # (incl. the conv3 feature-column clamp via the BGR column recompute)
    import jax.numpy as jnp

    from srcnn_cpp_tpu.ops.color import ycrcb2bgr_u8_planar
    from srcnn_cpp_tpu.ops.pallas_srcnn import (srcnn_merge_fused,
                                                srcnn_y_fused)

    rng = np.random.default_rng(b + h + w)
    up = rng.integers(0, 256, (b, 3, h, w), dtype=np.uint8)
    got = srcnn_merge_fused(jnp.asarray(up), weights)
    y_sr = srcnn_y_fused(jnp.asarray(up[:, 0]), weights)
    ref = ycrcb2bgr_u8_planar(jnp.stack(
        [y_sr, jnp.asarray(up[:, 1]), jnp.asarray(up[:, 2])], axis=1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pipeline_fused_post_pass_engages(weights):
    # x2 on an aligned geometry: the fused pipeline output must stay within
    # the pre-pass boundary-flip tolerance of the exact path (the post-pass
    # itself is bit-exact; flips originate in the CPU pre-pass only)
    from srcnn_cpp_tpu.pipeline import _upscale_planar_jit

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, (1, 3, 32, 128), dtype=np.uint8)
    a = np.asarray(_upscale_planar_jit(x, weights, (64, 256), "xla", "exact"))
    b = np.asarray(_upscale_planar_jit(x, weights, (64, 256), "xla", "fused"))
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 2 and (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())
