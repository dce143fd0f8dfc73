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
        assert th % 8 == 0 and 8 <= th <= 128
        assert tw % 128 == 0 and tw <= 3840
        # grids cover the plane
        assert -(-h // th) * th >= h and -(-w // tw) * tw >= w
    # full-width tiles at the production geometries; th divides the row
    # count exactly where possible (120 | 2160 and 120 | 1080 — the
    # round-5 measured-best tall tile, ab.py kernel packed/packed4k)
    assert _pick_tiles(2160, 3840) == (120, 3840)
    assert _pick_tiles(1080, 1920) == (120, 1920)


def test_row_clamp_plan_matches_reference_semantics():
    """For every (h, th): default scatters minus skips plus extras must give
    each output row exactly the reference's clamped feature-row/tap pairs
    (srcnn.cpp:200-210)."""
    from srcnn_cpp_tpu.ops.pallas_srcnn import _row_clamp_plan

    for h, th in [(17, 24), (25, 8), (40, 40), (100, 56), (1080, 64),
                  (1153, 64), (3, 8), (1, 8), (129, 64), (65, 8)]:
        skips, extras = _row_clamp_plan(h, th)
        gh = -(-h // th)
        for it in range(gh):
            got = {}  # g -> multiset of (global feature row, tap)
            for gl in range(th):
                g = it * th + gl
                if g >= h:
                    continue
                for dy in range(5):
                    rf = gl + dy
                    if it not in skips.get((rf, dy), ()):
                        got.setdefault(g, []).append((it * th + rf - 2, dy))
            for rf, adds in extras.items():
                for (itx, dy, ro) in adds:
                    if itx == it:
                        got.setdefault(it * th + ro, []).append(
                            (it * th + rf - 2, dy))
            for gl in range(th):
                g = it * th + gl
                if g >= h:
                    continue
                want = sorted((min(max(g + dy - 2, 0), h - 1), dy)
                              for dy in range(5))
                assert sorted(got[g]) == want, (h, th, g)


def test_fused_straddle_bottom_tile(weights):
    """Bottom 2 output rows split across two tiles ((h-1) % th == 0)."""
    from srcnn_cpp_tpu.ops.pallas_srcnn import (_fix_edges, _fused_call,
                                                _prep_weights)
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    import jax.numpy as jnp

    h, w, th, tw = 25, 260, 8, 384
    y = np.random.default_rng(7).integers(0, 256, (h, w), dtype=np.uint8)
    ref = np.asarray(srcnn_y(y, weights))
    hp = ((h + th - 1) // th) * th
    wp = ((w + tw - 1) // tw) * tw
    yp = jnp.pad(jnp.asarray(y), ((6, 10 + hp - h), (6, 122 + wp - w)),
                 mode="edge")
    out = _fused_call(yp, _prep_weights(weights), th, tw, true_h=h)
    out = np.asarray(_fix_edges(out[:h, :w], jnp.asarray(y), weights))
    d = np.abs(ref.astype(int) - out.astype(int))
    assert d.max() <= 1, f"max LSB {d.max()}"


def test_fused_edge_and_corner_semantics(weights):
    # Adversarial border content: saturated frame, gradients, and a batch
    # whose frames differ at the packing seams — locks the composite strip
    # edge fix (feature-column clamp) and the 8x8 corner recompute against
    # the XLA reference path on exactly the pixels they own.
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    h, w = 48, 200
    g = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = ((g[0] * 37 + g[1] * 11) % 256).astype(np.uint8)
    img[:3, :] = 255
    img[:, :3] = 0
    img[-3:, :] = 255
    img[:, -3:] = 0
    batch = np.stack([img, 255 - img, np.roll(img, 7, axis=1)])
    ref = np.asarray(srcnn_y(batch, weights)).astype(int)
    out = np.asarray(srcnn_y_fused(batch, weights)).astype(int)
    d = np.abs(ref - out)
    # border region (the edge fix's responsibility) must hold the same
    # <=1 LSB budget as the interior
    assert d.max() <= 1, d.max()
    border = np.ones_like(d, bool)
    border[:, 3:-3, 3:-3] = False
    assert d[border].max() <= 1


def test_fused_pack_false_matches_packed(weights):
    # the per-frame lax.map fallback (pack=False) must agree bitwise with
    # the packed composite default
    from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused

    y = np.random.default_rng(11).integers(0, 256, (2, 24, 150),
                                           dtype=np.uint8)
    a = np.asarray(srcnn_y_fused(y, weights, pack=True))
    b = np.asarray(srcnn_y_fused(y, weights, pack=False))
    assert np.array_equal(a, b)
