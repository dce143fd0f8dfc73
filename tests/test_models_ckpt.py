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
