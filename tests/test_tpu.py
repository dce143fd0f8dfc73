"""Opt-in REAL-TPU validation (skipped in the hermetic CPU suite).

Run with:  SRCNN_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q
(from a shell whose environment exposes the TPU backend — do not set
JAX_PLATFORMS=cpu; this module bypasses conftest's CPU forcing by spawning
a fresh interpreter.)

These duplicate the key golden gates on hardware: the same pallas/XLA
kernels that the CPU suite checks in interpret mode have genuinely
different lowerings on the chip (Mosaic vs interpreter, MXU split-precision
vs CPU fp32), so ≤1-LSB agreement must be re-established there.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SRCNN_TPU_TESTS") != "1",
    reason="set SRCNN_TPU_TESTS=1 (and provide a TPU) to run")

_SCRIPT = r"""
import numpy as np, json
from srcnn_cpp_tpu.runtime import enable_compilation_cache
enable_compilation_cache()
from srcnn_cpp_tpu.weights import load_weights
from srcnn_cpp_tpu.ops.srcnn import srcnn_y
from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_y_fused
from srcnn_cpp_tpu.imageio import imread_bgr
from srcnn_cpp_tpu.pipeline import upscale_bgr

w = load_weights()
res = {}
y = np.random.default_rng(0).integers(0, 256, (128, 256), dtype=np.uint8)
d = np.abs(np.asarray(srcnn_y(y, w)).astype(int)
           - np.asarray(srcnn_y_fused(y, w)).astype(int))
res["pallas_vs_xla_max_lsb"] = int(d.max())

bgr = imread_bgr("/root/reference/Pictures/butterfly.png")
ref = imread_bgr("tests/golden/butterfly_x1.5_ref.png")
out = np.asarray(upscale_bgr(bgr, 1.5))
d2 = np.abs(out.astype(int) - ref.astype(int))
res["pipeline_vs_binary_max_lsb"] = int(d2.max())
res["pipeline_vs_binary_frac"] = float((d2 > 0).mean())

# fused color+resize pre-pass (Mosaic): BIT-identical to the XLA engines
# on chip (neither XLA-TPU nor Mosaic FMA-contracts the vpass; the CPU
# suite can only check ~1e-5-loose parity, see tests/test_pallas_resize.py)
from srcnn_cpp_tpu.ops.pallas_resize import pre_upscale_fused
from srcnn_cpp_tpu.ops.color import bgr2ycrcb_u8_planar
from srcnn_cpp_tpu.ops.resize import resize_bicubic_u8

xb = np.random.default_rng(1).integers(0, 256, (2, 3, 270, 480),
                                       dtype=np.uint8)
fp = pre_upscale_fused(xb, (540, 960))
eng = resize_bicubic_u8(bgr2ycrcb_u8_planar(xb), (540, 960))
d3 = np.abs(np.asarray(fp).astype(int) - np.asarray(eng).astype(int))
res["fused_pre_vs_engine_max_lsb"] = int(d3.max())

# GENERALIZED plan (x3 rows cross OpenCV's f32 coefficient-drift boundary
# at output 1536): per-output-row coefficient planes, still BIT-identical.
# Only the chip can prove this — on CPU the ~1-LSB FMA caveat would mask
# a plan that wrongly reused the periodic coefficients (error ~0.06 LSB).
xg = np.random.default_rng(3).integers(0, 256, (1, 3, 540, 96),
                                       dtype=np.uint8)
fg = pre_upscale_fused(xg, (1620, 288))
eg = resize_bicubic_u8(bgr2ycrcb_u8_planar(xg), (1620, 288))
res["fused_pre_general_max_lsb"] = int(np.abs(
    np.asarray(fg).astype(int) - np.asarray(eg).astype(int)).max())

# x1.5 (P=3, S=2 both axes): the parity-deinterleaved kernel path —
# quadrant slab DMAs + per-tap parity-plane slices, still BIT-identical
x15 = np.random.default_rng(7).integers(0, 256, (2, 3, 180, 320),
                                        dtype=np.uint8)
f15 = pre_upscale_fused(x15, (270, 480))
e15 = resize_bicubic_u8(bgr2ycrcb_u8_planar(x15), (270, 480))
res["fused_pre_s2_max_lsb"] = int(np.abs(
    np.asarray(f15).astype(int) - np.asarray(e15).astype(int)).max())

# x1.25 (P=5, S=4 both axes — 16 parity quadrants, the round-4 _MAX_S=4
# extension) and x0.75 downscale (P=3, S=4): the highest-step quadrant
# DMA/slice paths must lower through Mosaic bit-identically too
x125 = np.random.default_rng(9).integers(0, 256, (2, 3, 144, 256),
                                         dtype=np.uint8)
f125 = pre_upscale_fused(x125, (180, 320))
e125 = resize_bicubic_u8(bgr2ycrcb_u8_planar(x125), (180, 320))
res["fused_pre_s4_max_lsb"] = int(np.abs(
    np.asarray(f125).astype(int) - np.asarray(e125).astype(int)).max())
x75 = np.random.default_rng(10).integers(0, 256, (2, 3, 192, 256),
                                         dtype=np.uint8)
f75 = pre_upscale_fused(x75, (144, 192))
e75 = resize_bicubic_u8(bgr2ycrcb_u8_planar(x75), (144, 192))
res["fused_pre_s4_down_max_lsb"] = int(np.abs(
    np.asarray(f75).astype(int) - np.asarray(e75).astype(int)).max())

# fused merge post-pass (Mosaic): bit-identical everywhere, including the
# masked ragged boundary blocks (576 = 4.5 x 128 lanes)
from srcnn_cpp_tpu.ops.pallas_merge import merge_ycrcb_to_bgr_fused
from srcnn_cpp_tpu.ops.color import ycrcb2bgr_u8_planar
import jax.numpy as jnp

rngm = np.random.default_rng(4)
ys = rngm.integers(0, 256, (2, 60, 576), dtype=np.uint8)
upm = rngm.integers(0, 256, (2, 3, 60, 576), dtype=np.uint8)
got = merge_ycrcb_to_bgr_fused(ys, upm)
refm = ycrcb2bgr_u8_planar(jnp.stack(
    [jnp.asarray(ys), jnp.asarray(upm[:, 1]), jnp.asarray(upm[:, 2])],
    axis=-3))
res["fused_merge_ragged_max_lsb"] = int(np.abs(
    np.asarray(got).astype(int) - np.asarray(refm).astype(int)).max())

# whole fused pipeline (pre + conv+merge-in-one-kernel) vs the exact path
from srcnn_cpp_tpu.pipeline import _upscale_planar_jit
xf = np.random.default_rng(5).integers(0, 256, (2, 3, 128, 256),
                                       dtype=np.uint8)
a = np.asarray(_upscale_planar_jit(xf, w, (256, 512), "pallas", "exact"))
b = np.asarray(_upscale_planar_jit(xf, w, (256, 512), "pallas", "fused"))
res["fused_pipeline_max_lsb"] = int(np.abs(a.astype(int)
                                           - b.astype(int)).max())

# conv+quantize+merge single-kernel path vs the separate composition
from srcnn_cpp_tpu.ops.pallas_srcnn import srcnn_merge_fused, srcnn_y_fused
upm2 = np.random.default_rng(8).integers(0, 256, (2, 3, 96, 200),
                                         dtype=np.uint8)
gm = srcnn_merge_fused(jnp.asarray(upm2), w)
rm = ycrcb2bgr_u8_planar(jnp.stack(
    [srcnn_y_fused(jnp.asarray(upm2[:, 0]), w),
     jnp.asarray(upm2[:, 1]), jnp.asarray(upm2[:, 2])], axis=1))
res["conv_merge_fused_max_lsb"] = int(np.abs(
    np.asarray(gm).astype(int) - np.asarray(rm).astype(int)).max())

# pallas-inside-shard_map tiled paths (Mosaic on real chip), 1-D and 2-D
import jax
if len(jax.devices()) >= 1:
    from srcnn_cpp_tpu.parallel import make_mesh, pre_upscale_fused_rows
    from srcnn_cpp_tpu.parallel.tiling import srcnn_y_tiled
    mesh = make_mesh(data=1, row=1, col=1)
    yt = np.random.default_rng(2).integers(0, 256, (1, 64, 128),
                                           dtype=np.uint8)
    dt = np.abs(np.asarray(srcnn_y_tiled(yt, w, mesh, kernel="pallas"))
                .astype(int) - np.asarray(srcnn_y(yt, w)).astype(int))
    res["pallas_tiled_max_lsb"] = int(dt.max())

    # sharded fused pre-pass: validates the MOSAIC LOWERING of the
    # kernel-under-shard_map composition on a 1-device mesh (no ppermute
    # fires with row=1 — multi-device halo/phase logic is covered by the
    # 8-virtual-device CPU tests in test_tiling.py; one real chip cannot
    # exercise a multi-row mesh)
    xs = np.random.default_rng(6).integers(0, 256, (1, 3, 64, 160),
                                           dtype=np.uint8)
    ps = pre_upscale_fused_rows(xs, (128, 320), mesh)
    pe = resize_bicubic_u8(bgr2ycrcb_u8_planar(xs), (128, 320))
    res["fused_pre_rows_max_lsb"] = int(np.abs(
        np.asarray(ps).astype(int) - np.asarray(pe).astype(int)).max())

    # sharded GENERALIZED plan (x3 drift geometry): coef planes sharded
    # over "row" + Mosaic lowering of the coef-plane kernel under
    # shard_map (1-device mesh; multi-device slicing is CPU-covered)
    xg2 = np.random.default_rng(9).integers(0, 256, (1, 3, 540, 96),
                                            dtype=np.uint8)
    pg = pre_upscale_fused_rows(xg2, (1620, 288), mesh)
    eg2 = resize_bicubic_u8(bgr2ycrcb_u8_planar(xg2), (1620, 288))
    res["fused_pre_rows_general_max_lsb"] = int(np.abs(
        np.asarray(pg).astype(int) - np.asarray(eg2).astype(int)).max())

    # sharded S=2 PARITY plan (x1.5, round 5): quadrant-slab kernel under
    # shard_map with the S-generalized halo widths — Mosaic lowering of
    # the parity path in the sharded composition (multi-device offsets
    # are CPU-covered by test_tiling.py parity gates)
    x15s = np.random.default_rng(11).integers(0, 256, (1, 3, 180, 320),
                                              dtype=np.uint8)
    p15 = pre_upscale_fused_rows(x15s, (270, 480), mesh)
    assert p15 is not None
    e15s = resize_bicubic_u8(bgr2ycrcb_u8_planar(x15s), (270, 480))
    res["fused_pre_rows_s2_max_lsb"] = int(np.abs(
        np.asarray(p15).astype(int) - np.asarray(e15s).astype(int)).max())
print("RESULT " + json.dumps(res))
"""


def test_tpu_golden_gates():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run([sys.executable, "-c", _SCRIPT],
                          capture_output=True, text=True, timeout=1200,
                          env=env, cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[-1][len("RESULT "):])
    assert res["pallas_vs_xla_max_lsb"] <= 1
    assert res["pipeline_vs_binary_max_lsb"] <= 2
    assert res["pipeline_vs_binary_frac"] < 0.01
    assert res["fused_pre_vs_engine_max_lsb"] == 0   # bit-identical on chip
    assert res["fused_pre_general_max_lsb"] == 0     # drifted-coef plan too
    assert res["fused_pre_s2_max_lsb"] == 0          # x1.5 parity planes
    assert res["fused_pre_s4_max_lsb"] == 0          # x1.25: 16 quadrants
    assert res["fused_pre_s4_down_max_lsb"] == 0     # x0.75 downscale
    assert res["fused_merge_ragged_max_lsb"] == 0    # bit-identical on chip
    assert res["fused_pipeline_max_lsb"] == 0        # bit-identical on chip
    assert res["conv_merge_fused_max_lsb"] == 0      # one-kernel conv+merge
    assert res.get("pallas_tiled_max_lsb", 0) <= 1
    assert res.get("fused_pre_rows_max_lsb", 0) == 0
    assert res.get("fused_pre_rows_general_max_lsb", 0) == 0
    assert res.get("fused_pre_rows_s2_max_lsb", 0) == 0  # sharded parity
