"""Model family, checkpoint round-trips, profiling utils, scaling harness."""

import numpy as np
import pytest


def test_model_default_matches_ops(weights):
    from srcnn_cpp_tpu.models import SRCNN
    from srcnn_cpp_tpu.ops.srcnn import srcnn_y

    m = SRCNN()
    y = np.random.default_rng(0).integers(0, 256, (24, 32), dtype=np.uint8)
    a = np.asarray(m.infer_u8(weights, y))
    b = np.asarray(srcnn_y(y, weights))
    assert np.array_equal(a, b)
    assert m.num_params() == 8129  # 64*81+64 + 32*64+32 + 32*25+1


def test_model_family_generic_config():
    import jax

    from srcnn_cpp_tpu.models import SRCNN

    m = SRCNN(n1=16, n2=8, f1=9, f2=3, f3=5)
    w = m.init(jax.random.PRNGKey(0))
    y = np.random.default_rng(1).integers(0, 256, (20, 20), dtype=np.uint8)
    out = np.asarray(m.apply(w, y))
    assert out.shape == (20, 20)
    assert np.isfinite(out).all()


def test_npz_checkpoint_roundtrip(tmp_path, weights):
    from srcnn_cpp_tpu.weights import load_weights
    from srcnn_cpp_tpu.weights.checkpoint import save_npz

    p = tmp_path / "ck.npz"
    save_npz(p, weights)
    back = load_weights(p)
    assert np.array_equal(back.conv1_w, np.asarray(weights.conv1_w))


def test_orbax_checkpoint_roundtrip(tmp_path, weights):
    pytest.importorskip("orbax.checkpoint")
    from srcnn_cpp_tpu.weights.checkpoint import load_orbax, save_orbax

    p = tmp_path / "orbax_ck"
    save_orbax(p, weights)
    back = load_orbax(p)
    assert np.array_equal(back.conv3_w, np.asarray(weights.conv3_w))


def test_convdata_header_export_reparses(tmp_path, weights):
    from srcnn_cpp_tpu.weights.checkpoint import export_convdata_header
    from srcnn_cpp_tpu.weights.parse_convdata import parse_convdata

    p = tmp_path / "convdata_export.h"
    export_convdata_header(p, weights)
    arrays = parse_convdata(p)
    for k in arrays:
        np.testing.assert_allclose(arrays[k], np.asarray(getattr(weights, k)),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_convdata_header_export_compiles_against_reference_shapes(
        tmp_path, weights):
    """The exported header must satisfy the reference's type contract.

    The reference kernels consume the arrays through the convdata.h
    typedefs (ConvKernel64_99[64][9][9] etc., reference convdata.h:10-16;
    call sites srcnn.cpp:609,627) — compile a consumer with those exact
    signatures against the export to prove drop-in compatibility.
    """
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    from srcnn_cpp_tpu.weights.checkpoint import export_convdata_header

    export_convdata_header(tmp_path / "convdata.h", weights)
    consumer = tmp_path / "consumer.cpp"
    consumer.write_text(
        '#include "convdata.h"\n'
        "static_assert(sizeof(weights_conv1_data) == 64*9*9*sizeof(float));\n"
        "static_assert(sizeof(weights_conv2_data) == 32*64*sizeof(float));\n"
        "static_assert(sizeof(weights_conv3_data) == 32*5*5*sizeof(float));\n"
        "static_assert(sizeof(biases_conv1) == 64*sizeof(float));\n"
        "static_assert(sizeof(biases_conv2) == 32*sizeof(float));\n"
        "// reference kernel signatures (srcnn.cpp Convolution99x11/55)\n"
        "static void c99x11(const ConvKernel64_99 k99, const ConvKernel1 b1,\n"
        "                   const ConvKernel32x64 k11, const ConvKernel2 b2) {\n"
        "  (void)k99[63][8][8]; (void)b1[63]; (void)k11[31][63]; (void)b2[31];\n"
        "}\n"
        "static void c55(const ConvKernel32_55 k, float b) {\n"
        "  (void)k[31][4][4]; (void)b;\n"
        "}\n"
        "int main() { c99x11(weights_conv1_data, biases_conv1,\n"
        "                    weights_conv2_data, biases_conv2);\n"
        "             c55(weights_conv3_data, biases_conv3); return 0; }\n")
    proc = subprocess.run(
        ["g++", "-fsyntax-only", "-std=c++17", str(consumer)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr


def test_stage_timer_and_throughput():
    from srcnn_cpp_tpu.utils.profiling import StageTimer, throughput

    t = StageTimer()
    with t.span("a"):
        pass
    assert "a" in t.spans and "TOTAL" in t.report()
    import jax.numpy as jnp

    mps = throughput(lambda: jnp.ones((64, 64)), out_px=64 * 64, iters=2,
                     repeats=1)
    assert mps > 0


def test_scaling_harness_smoke(weights):
    from srcnn_cpp_tpu.parallel.multihost import scaling_efficiency

    r = scaling_efficiency(weights, image_hw=(64, 64), batch=1,
                           device_counts=[1, 2], iters=1)
    assert set(r["mps"]) == {1, 2}
    assert r["efficiency"] is not None


def test_nan_guard_and_check_finite(weights):
    import jax.numpy as jnp
    import pytest as _pytest

    from srcnn_cpp_tpu.utils.debug import EXIT_CODES, check_finite, nan_guard

    check_finite(weights, "weights")  # pretrained checkpoint is finite
    bad = {"a": np.array([1.0, np.nan])}
    with _pytest.raises(FloatingPointError):
        check_finite(bad, "bad")
    assert EXIT_CODES["load_or_scale"] == 1
    with nan_guard():
        # finite computation passes through the guard untouched
        assert float(jnp.sum(jnp.ones(4))) == 4.0
