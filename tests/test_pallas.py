"""Fused Pallas kernel vs the fp32 XLA path (interpret mode on CPU).

Gate: <=1 quantization LSB anywhere (the split-precision matmuls carry
~2^-16 relative error against fp32).  On real TPU hardware the same
comparison runs in tests/test_tpu.py (opt-in).
"""

import numpy as np
import pytest


def _cmp(shape, seed, weights):
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    y = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    ref = np.asarray(srcnn_y(y, weights))
    out = np.asarray(srcnn_y_fused(y, weights))
    d = np.abs(ref.astype(int) - out.astype(int))
    return d.max(), (d > 0).mean()


@pytest.mark.parametrize("shape,seed", [
    ((40, 520), 0),    # multi col-tile, unaligned W
    ((64, 128), 1),    # single col-tile
    ((100, 700), 2),   # unaligned both
    ((17, 130), 3),    # tiny, heavy alignment padding
])
def test_fused_matches_xla(shape, seed, weights):
    mx, frac = _cmp(shape, seed, weights)
    assert mx <= 1, f"max LSB {mx}"
    assert frac < 5e-3, f"diff fraction {frac}"


def test_fused_batch_vmap(weights):
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    y = np.random.default_rng(9).integers(0, 256, (3, 32, 256), dtype=np.uint8)
    ref = np.asarray(srcnn_y(y, weights))
    out = np.asarray(srcnn_y_fused(y, weights))
    assert out.shape == ref.shape
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


def test_split_hi_lo_reconstructs(weights):
    from srcnn_cpp_tpu.ops.pallas_srcnn import _split_hi_lo

    x = np.random.default_rng(0).normal(scale=100, size=(64, 96)).astype(np.float32)
    hi, lo = _split_hi_lo(x)
    rec = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    rel = np.abs(rec - x) / np.maximum(np.abs(x), 1e-6)
    assert rel.max() < 2 ** -15


def test_fused_constant_plane(weights):
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    y = np.full((24, 256), 100, dtype=np.uint8)
    out = np.asarray(srcnn_y_fused(y, weights))
    ref = np.asarray(srcnn_y(y, weights))
    assert (out == out[12, 128]).all()
    assert abs(int(out[12, 128]) - int(ref[12, 128])) <= 1


def test_pick_tiles_policy():
    """Tile policy invariants: alignment, bounds, and coverage economy."""
    from srcnn_cpp_tpu.ops.pallas_srcnn import _pick_tiles

    for h, w in [(2160, 3840), (1080, 1920), (540, 960), (270, 1932),
                 (100, 100), (8, 128), (7, 60), (4320, 7680), (33, 640)]:
        th, tw = _pick_tiles(h, w)
        assert th % 8 == 0 and 8 <= th <= 64
        assert tw % 128 == 0 and tw <= 3840
        # grids cover the plane
        assert -(-h // th) * th >= h and -(-w // tw) * tw >= w
    # full-width tiles at the production geometries
    assert _pick_tiles(2160, 3840) == (64, 3840)
    assert _pick_tiles(1080, 1920) == (64, 1920)
