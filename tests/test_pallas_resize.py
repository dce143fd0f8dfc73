"""Fused color+resize pre-pass kernel: parity vs the XLA engines.

Runs in Pallas interpret mode on CPU.  The numerics contract is
bit-identity with ``resize_bicubic_u8(bgr2ycrcb_u8_planar(x), out_hw)``
ON TPU; on the CPU backend XLA may FMA-contract the vertical pass's
mul+add *program-dependently* (see ops/pallas_resize.py docstring), so a
handful of exact-.5-boundary pixels (~1e-5) may flip by 1 LSB between the
two programs here.  CPU tests therefore allow <=1 LSB on a tiny fraction;
the strict on-chip gate lives in tests/test_tpu.py.
"""

import numpy as np
import pytest


def _ref(bgr_p, out_hw):
    from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
    from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8

    return np.asarray(resize_bicubic_u8(bgr2ycrcb_u8_planar(bgr_p), out_hw))


def _assert_parity(got, ref):
    got, ref = np.asarray(got), np.asarray(ref)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 1, d.max()
    assert (d > 0).mean() < 1e-4, (d > 0).mean()   # boundary flips only


@pytest.mark.parametrize("ih,iw,s", [
    (64, 96, 2), (32, 160, 2), (40, 128, 3), (24, 96, 4),
    (64, 96, 1.5), (54, 172, 1.5), (92, 250, 1.5),   # S=2 parity planes
    (64, 256, 0.5), (126, 300, 0.5),                 # 2:1 downscale (S=2)
    (64, 128, 1.25), (48, 160, 1.75), (40, 128, 2.5),   # S=4 / S=2
    (64, 192, 0.75), (63, 384, 1 / 3), (48, 512, 0.25),  # S=4/3/4 down
])
def test_fused_pre_parity_integer_scales(ih, iw, s):
    from srcnn_cpp_tpu.ops.resize import scaled_size
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused

    rng = np.random.default_rng(int(ih + iw + s))
    x = rng.integers(0, 256, (2, 3, ih, iw), dtype=np.uint8)
    ow, oh = scaled_size(iw, ih, s)
    out_hw = (oh, ow)
    got = pre_upscale_fused(x, out_hw)
    assert got is not None, (ih, iw, s)
    _assert_parity(got, _ref(x, out_hw))


def test_fused_pre_bench_geometry():
    # the production x2 shape family (scaled down in H for test speed):
    # full-width 1080p columns exercise the real tiling/tile-overshoot
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (1, 3, 48, 1920), dtype=np.uint8)
    got = pre_upscale_fused(x, (96, 3840))
    assert got is not None
    _assert_parity(got, _ref(x, (96, 3840)))


def test_fused_pre_single_frame_squeeze():
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (3, 40, 144), dtype=np.uint8)
    got = pre_upscale_fused(x, (80, 288))
    assert got is not None and got.shape == (3, 80, 288)
    _assert_parity(got, _ref(x[None], (80, 288))[0])


def test_fused_pre_declines_nonphase_geometries():
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused

    x = np.zeros((1, 3, 64, 128), dtype=np.uint8)
    # x1.2: the phase plans have source step 5 — beyond the S<=4 the
    # parity-deinterleaved kernel supports (x1.25/x0.75's S=4 and the
    # 3:1/4:1 downscales are now covered, tested above)
    assert pre_upscale_fused(x, (76, 153)) is None
    # non-periodic ratio (50/64): no period P<=8 exists
    assert pre_upscale_fused(x, (50, 256)) is None
    # tiny planes decline too
    assert pre_upscale_fused(np.zeros((1, 3, 2, 16), np.uint8),
                             (4, 32)) is None


def test_pipeline_resize_fused_matches_exact(weights):
    from srcnn_cpp_tpu.pipeline import _upscale_planar_jit

    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, (2, 3, 32, 144), dtype=np.uint8)
    a = np.asarray(_upscale_planar_jit(x, weights, (64, 288), "xla",
                                       "exact"))
    b = np.asarray(_upscale_planar_jit(x, weights, (64, 288), "xla",
                                       "fused"))
    # pre-pass boundary flips propagate through the conv, so compare with
    # the same tolerance shape as the pre-pass parity
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 2 and (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())
    # non-integer scale falls back inside the jit: identical by definition
    a = np.asarray(_upscale_planar_jit(x, weights, (48, 216), "xla",
                                       "exact"))
    b = np.asarray(_upscale_planar_jit(x, weights, (48, 216), "xla",
                                       "fused"))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("oh,ih,ow,iw,which", [
    (1620, 540, 288, 96, "v"),    # x3 rows cross the f32 boundary at 1536
    (192, 64, 1620, 540, "h"),    # x3 cols cross it
])
def test_fused_pre_generalized_plan(oh, ih, ow, iw, which):
    # Non-power-of-2 integer upscales past output 1536: OpenCV's float32
    # fractional offsets stop repeating bitwise, the strict plan declines,
    # and the GENERALIZED plan (periodic indices + per-output coefficient
    # planes) takes over — found via the round-4 x3 bench, where 540p x3
    # silently fell back to the XLA engines.
    from srcnn_cpp_tpu.ops.pallas_resize import _pre_plans, \
        _pre_statics, pre_upscale_fused

    assert _pre_statics(oh, ih, ow, iw) is None   # strict really declines
    st, vcf, hcf = _pre_plans(oh, ih, ow, iw)
    assert st is not None
    assert (st[5] is None) == (which == "v") == (vcf is not None)
    assert (st[7] is None) == (which == "h") == (hcf is not None)

    rng = np.random.default_rng(oh + ow)
    x = rng.integers(0, 256, (1, 3, ih, iw), dtype=np.uint8)
    got = pre_upscale_fused(x, (oh, ow))
    assert got is not None
    _assert_parity(got, _ref(x, (oh, ow)))


def test_fused_pre_fuzz_random_geometries():
    # randomized geometries across ALL plan families — integer upscales
    # (strict), x1.5/x0.5 (S=2 parity planes), x1.25/x0.75 (S=4): odd
    # widths/heights exercise ragged tile overshoot, phase interleaves
    # and the padding arithmetic
    from srcnn_cpp_tpu.ops.resize import scaled_size
    from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused

    rng = np.random.default_rng(42)
    tried = 0
    scales = [2, 3, 4, 1.5, 0.5, 1.25, 0.75]
    for i in range(21):
        s = scales[i % len(scales)]
        mult = {0.5: 2, 1.25: 4, 0.75: 4}.get(s, 1)
        ih = int(rng.integers(9, 70)) * mult
        iw = int(rng.integers(33, 400)) * (2 if s == 0.5 else mult)
        ow, oh = scaled_size(iw, ih, s)
        if oh < 8 or ow < 128:
            continue
        x = rng.integers(0, 256, (1, 3, ih, iw), dtype=np.uint8)
        got = pre_upscale_fused(x, (oh, ow))
        if got is None:      # geometry without a step<=4 phase plan
            continue
        tried += 1
        _assert_parity(got, _ref(x, (oh, ow)))
    assert tried >= 12, f"fuzz covered only {tried} geometries"
