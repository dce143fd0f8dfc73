"""Spatial tiling gate: tiled-with-halo-exchange == monolithic, bit-exact.

Runs on the 8-virtual-CPU-device mesh (conftest).  This is the pure-logic
multi-chip test SURVEY.md §4d calls for: seam correctness needs no real
cluster, only correct halo plumbing.
"""

import numpy as np
import pytest


def _rand_y(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.fixture(scope="module")
def mesh24():
    from srcnn_cpp_tpu.parallel import make_mesh

    return make_mesh(data=2, row=4)


@pytest.fixture(scope="module")
def mesh18():
    from srcnn_cpp_tpu.parallel import make_mesh

    return make_mesh(data=1, row=8)


def test_tiled_bit_exact_vs_monolithic(weights, mesh24):
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel import srcnn_y_tiled

    y = _rand_y((2, 64, 96))
    mono = np.asarray(srcnn_y(y, weights))
    tiled = np.asarray(srcnn_y_tiled(y, weights, mesh24))
    assert np.array_equal(mono, tiled)


def test_tiled_8way_rows(weights, mesh18):
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel import srcnn_y_tiled

    # 8 row-tiles of height 16 — halo (6) is a large fraction of the tile,
    # which stresses the exchange plumbing hardest.
    y = _rand_y((1, 128, 64), seed=3)
    mono = np.asarray(srcnn_y(y, weights))
    tiled = np.asarray(srcnn_y_tiled(y, weights, mesh18))
    assert np.array_equal(mono, tiled)


def test_tiled_rejects_indivisible(weights, mesh24):
    from srcnn_cpp_tpu.parallel import srcnn_y_tiled

    with pytest.raises(ValueError):
        srcnn_y_tiled(_rand_y((2, 65, 64)), weights, mesh24)


def test_upscale_y_tiled_pads_and_crops(weights, mesh24):
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel import upscale_y_tiled

    # H=61 not divisible by 4 row-tiles; single plane (2-D input).
    y = _rand_y((61, 40), seed=5)
    mono = np.asarray(srcnn_y(y, weights))
    tiled = upscale_y_tiled(y, weights, mesh24)
    assert tiled.shape == mono.shape
    assert np.array_equal(mono, tiled)


def test_mesh_construction():
    import jax

    from srcnn_cpp_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    m = make_mesh()
    assert dict(m.shape) == {"data": 1, "row": 8, "col": 1}
    m2 = make_mesh(data=4)
    assert dict(m2.shape) == {"data": 4, "row": 2, "col": 1}
    m3 = make_mesh(data=1, row=4, col=2)
    assert dict(m3.shape) == {"data": 1, "row": 4, "col": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, row=3)


def test_tiled_2d_bit_exact_vs_monolithic(weights):
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel import make_mesh, srcnn_y_tiled

    # 2-D spatial mesh: rows x cols halo exchange on both axes
    mesh = make_mesh(data=1, row=2, col=4)
    y = _rand_y((1, 64, 96), seed=7)
    mono = np.asarray(srcnn_y(y, weights))
    tiled = np.asarray(srcnn_y_tiled(y, weights, mesh))
    assert np.array_equal(mono, tiled)


def test_tiled_2d_with_data_axis(weights):
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel import make_mesh, srcnn_y_tiled

    mesh = make_mesh(data=2, row=2, col=2)
    y = _rand_y((2, 48, 64), seed=8)
    mono = np.asarray(srcnn_y(y, weights))
    tiled = np.asarray(srcnn_y_tiled(y, weights, mesh))
    assert np.array_equal(mono, tiled)


def test_gspmd_matches_monolithic_and_manual(weights, mesh24):
    # two independent partitioners (XLA SPMD vs hand shard_map) vs monolith
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel import srcnn_y_tiled
    from srcnn_cpp_tpu.parallel.gspmd import srcnn_y_gspmd

    y = _rand_y((2, 64, 96), seed=12)
    mono = np.asarray(srcnn_y(y, weights))
    auto = np.asarray(srcnn_y_gspmd(y, weights, mesh24))
    manual = np.asarray(srcnn_y_tiled(y, weights, mesh24))
    assert np.array_equal(mono, auto)
    assert np.array_equal(mono, manual)


def test_gspmd_handles_indivisible_dims(weights, mesh24):
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y
    from srcnn_cpp_tpu.parallel.gspmd import srcnn_y_gspmd

    y = _rand_y((2, 61, 53), seed=13)  # nothing divides by the mesh
    mono = np.asarray(srcnn_y(y, weights))
    auto = np.asarray(srcnn_y_gspmd(y, weights, mesh24))
    assert np.array_equal(mono, auto)


def test_pallas_tiled_matches_monolithic(weights):
    # the fused-kernel-per-device composition (production multi-chip path)
    # must agree with the monolithic paths within the usual 1-LSB
    # split-precision budget, including the global top/bottom rows that
    # take the masked strip recompute
    import jax
    from srcnn_cpp_tpu.parallel import make_mesh
    from srcnn_cpp_tpu.parallel.tiling import srcnn_y_tiled
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    mesh = make_mesh(data=2, row=4)
    y = np.random.default_rng(21).integers(0, 256, (2, 64, 144),
                                           dtype=np.uint8)
    out = np.asarray(srcnn_y_tiled(y, weights, mesh, kernel="pallas"))
    ref = np.asarray(srcnn_y(y, weights))
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 1, d.max()


def test_pallas_tiled_2d_matches_monolithic(weights):
    # fused kernel on a (row x col) mesh: interior column seams come from
    # the crop-after-halo composition, true edges from the masked strip
    # recomputes (tiling._srcnn_tile2d_fused)
    from srcnn_cpp_tpu.parallel import make_mesh
    from srcnn_cpp_tpu.parallel.tiling import srcnn_y_tiled
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    y = np.random.default_rng(22).integers(0, 256, (2, 48, 160),
                                           dtype=np.uint8)
    ref = np.asarray(srcnn_y(y, weights))
    for shape in [dict(data=2, row=2, col=2), dict(data=1, row=2, col=4)]:
        mesh = make_mesh(**shape)
        out = np.asarray(srcnn_y_tiled(y, weights, mesh, kernel="pallas"))
        d = np.abs(out.astype(int) - ref.astype(int))
        assert d.max() <= 1, (shape, d.max())

    # tiles below the 8x8 strip minimum are rejected explicitly
    mesh = make_mesh(data=2, row=2, col=2)
    with np.testing.assert_raises(ValueError):
        srcnn_y_tiled(y[:, :12, :], weights, mesh, kernel="pallas")


def test_pre_upscale_fused_rows_matches_monolith(weights, mesh24):
    # row-sharded Pallas pre-pass: stitched plane vs the monolithic kernel
    # and the XLA engine.  Exact on one backend/program pair is the TPU
    # gate (test_tpu.py); CPU allows the documented FMA boundary flips.
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
    from srcnn_cpp_tpu.parallel import pre_upscale_fused_rows

    rng = np.random.default_rng(7)
    for s, b in [(2, 2), (3, 4)]:
        x = rng.integers(0, 256, (b, 3, 64, 160), dtype=np.uint8)
        out_hw = (64 * s, 160 * s)
        got = pre_upscale_fused_rows(x, out_hw, mesh24)
        assert got is not None, (s, b)
        for ref in (pre_upscale_fused(x, out_hw),
                    resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)):
            d = np.abs(np.asarray(got).astype(int)
                       - np.asarray(ref).astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-4, (s, b, d.max())


def test_pre_upscale_fused_rows_declines(weights, mesh24):
    from srcnn_cpp_tpu.parallel import make_mesh, pre_upscale_fused_rows

    x = np.zeros((2, 3, 64, 160), dtype=np.uint8)
    # x1.2: source step 5 > _MAX_S on both axes — no plan at all
    assert pre_upscale_fused_rows(x, (76, 192), mesh24) is None
    # rows not divisible by the mesh row axis
    x2 = np.zeros((2, 3, 63, 160), dtype=np.uint8)
    assert pre_upscale_fused_rows(x2, (126, 320), mesh24) is None
    # column-sharded: local blocks under the 128-lane kernel minimum
    mesh2d = make_mesh(data=1, row=2, col=4)
    assert pre_upscale_fused_rows(x, (128, 320), mesh2d) is None
    # column-sharded: width not divisible by the col axis
    x3 = np.zeros((2, 3, 64, 634), dtype=np.uint8)
    assert pre_upscale_fused_rows(x3, (128, 1268), mesh2d) is None


def test_pre_upscale_fused_rows_generalized_plan(weights, mesh24):
    # x3 past OpenCV's f32 coefficient-drift boundary (output rows >=
    # 1536): the per-output coefficient planes shard over ``row`` and the
    # stitched plane still matches the engine (round-4 extension)
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
    from srcnn_cpp_tpu.parallel import pre_upscale_fused_rows

    rng = np.random.default_rng(17)
    x = rng.integers(0, 256, (2, 3, 540, 96), dtype=np.uint8)
    got = pre_upscale_fused_rows(x, (1620, 288), mesh24)
    assert got is not None
    ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (1620, 288))
    d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-4, (d.max(), (d > 0).mean())


def test_pre_upscale_fused_rows_parity_plans(weights, mesh24):
    # S>=2 parity plans sharded (round 5): the deinterleave is local, so
    # each device's plan matches the global one whenever the exact row
    # ratio holds — x1.5 (pv=3, sv=2), x0.75 (pv=3, sv=4) and the 2:1
    # downscale (pv=1, sv=2) all stitch to the monolithic engine
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
    from srcnn_cpp_tpu.parallel import pre_upscale_fused_rows

    rng = np.random.default_rng(23)
    for scale, ih, iw in [(1.5, 64, 192), (0.75, 96, 256), (0.5, 128, 512),
                          (1.25, 96, 256)]:  # S=4: 16 quadrants sharded
        x = rng.integers(0, 256, (2, 3, ih, iw), dtype=np.uint8)
        out_hw = (int(ih * scale), int(iw * scale))
        got = pre_upscale_fused_rows(x, out_hw, mesh24)
        assert got is not None, scale
        for ref in (pre_upscale_fused(x, out_hw),
                    resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)):
            d = np.abs(np.asarray(got).astype(int)
                       - np.asarray(ref).astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-4, (scale, d.max())


def test_pre_upscale_fused_rows_fuzz(weights, mesh24):
    # randomized RATIONAL-scale geometries, anisotropic (independent p/q
    # per axis), through the sharded path: exercises plan admission, the
    # S-generalized halo widths and the per-device phase/ratio checks
    # across the space rather than the curated scales.  A 40-geometry
    # sweep of this generator (2026-08-20) passed with worst LSB 1.
    import random

    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
    from srcnn_cpp_tpu.parallel import pre_upscale_fused_rows

    random.seed(77)
    rng = np.random.default_rng(1)
    fused = 0
    for trial in range(24):
        qv, pv = random.randrange(1, 5), random.randrange(1, 13)
        qh, ph = random.randrange(1, 5), random.randrange(1, 13)
        ih = random.randrange(2, 12) * qv * 4
        iw = max(128, random.randrange(32, 80) * qh)
        oh, ow = ih * pv // qv, iw * ph // qh
        if not (32 <= oh <= 600 and oh % 4 == 0 and 128 <= ow <= 900):
            continue
        x = rng.integers(0, 256, (2, 3, ih, iw), dtype=np.uint8)
        out = pre_upscale_fused_rows(x, (oh, ow), mesh24)
        if out is None:
            continue
        fused += 1
        ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (oh, ow))
        d = np.abs(np.asarray(out).astype(int) - np.asarray(ref).astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 1e-3, \
            (ih, iw, oh, ow, int(d.max()))
        if fused >= 8:       # bound the suite cost; the generator is the gate
            break
    assert fused >= 6, f"fuzz exercised only {fused} sharded geometries"


def test_pre_upscale_fused_2d_parity_plan(weights):
    # x1.5 on a (row, col) mesh: parity plans with BOTH row and lane halos
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
    from srcnn_cpp_tpu.parallel import make_mesh, pre_upscale_fused_rows

    mesh2d = make_mesh(data=1, row=2, col=4)
    rng = np.random.default_rng(29)
    x = rng.integers(0, 256, (2, 3, 64, 1024), dtype=np.uint8)
    got = pre_upscale_fused_rows(x, (96, 1536), mesh2d)
    assert got is not None
    ref = resize_bicubic_u8(bgr2ycrcb_u8_planar(x), (96, 1536))
    d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-4, d.max()


def test_pre_upscale_fused_2d_matches_monolith(weights):
    # 2-D (row, col) mesh: per-device kernel with BOTH row and lane
    # ppermute halos stitches to the monolithic kernel's plane (round-4
    # column-halo support; formerly an undocumented rows-only waiver)
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8
    from srcnn_cpp_tpu.parallel import make_mesh, pre_upscale_fused_rows

    mesh2d = make_mesh(data=1, row=2, col=4)
    rng = np.random.default_rng(8)
    for s, iw in [(2, 256), (3, 192)]:
        x = rng.integers(0, 256, (2, 3, 64, iw), dtype=np.uint8)
        out_hw = (64 * s, iw * s)
        got = pre_upscale_fused_rows(x, out_hw, mesh2d)
        assert got is not None, (s, iw)
        for ref in (pre_upscale_fused(x, out_hw),
                    resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)):
            d = np.abs(np.asarray(got).astype(int)
                       - np.asarray(ref).astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-4, (s, iw, d.max())


def test_merge_fused_rows_bit_equal(weights, mesh24):
    # pointwise post-pass: per-device kernel == monolithic kernel exactly
    from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused
    from srcnn_cpp_tpu.parallel.tiling import merge_ycrcb_to_bgr_fused_rows

    rng = np.random.default_rng(11)
    y_sr = rng.integers(0, 256, (2, 64, 192), dtype=np.uint8)
    up = rng.integers(0, 256, (2, 3, 64, 192), dtype=np.uint8)
    got = merge_ycrcb_to_bgr_fused_rows(y_sr, up, mesh24)
    assert got is not None
    # (row, col) mesh: pointwise, so 2-D tiles are trivially exact too
    from srcnn_cpp_tpu.parallel import make_mesh

    mesh2d = make_mesh(data=2, row=2, col=2)
    y2 = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    up2 = rng.integers(0, 256, (2, 3, 64, 256), dtype=np.uint8)
    got2d = merge_ycrcb_to_bgr_fused_rows(y2, up2, mesh2d)
    assert got2d is not None
    ref2d = merge_ycrcb_to_bgr_fused(y2, up2)
    assert np.array_equal(np.asarray(got2d), np.asarray(ref2d))
    ref = merge_ycrcb_to_bgr_fused(y_sr, up)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    # ragged local rows (60/4 = 15) ride the kernel's masked blocks
    got60 = merge_ycrcb_to_bgr_fused_rows(y_sr[:, :60], up[:, :, :60], mesh24)
    assert got60 is not None
    assert np.array_equal(
        np.asarray(got60),
        np.asarray(merge_ycrcb_to_bgr_fused(y_sr[:, :60], up[:, :, :60])))
    # declines: rows not divisible by the mesh / tiny local blocks
    assert merge_ycrcb_to_bgr_fused_rows(
        y_sr[:, :62], up[:, :, :62], mesh24) is None
    assert merge_ycrcb_to_bgr_fused_rows(
        y_sr[:, :16], up[:, :, :16], mesh24) is None
