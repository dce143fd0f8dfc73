"""Named production configs (CPU, tiny shapes)."""

import numpy as np


def test_batch_config(weights):
    from srcnn_cpp_tpu.configs import batch_1080p_to_4k

    run = batch_1080p_to_4k(weights, kernel="xla", resize="exact")
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 24, 32, 3), dtype=np.uint8)
    out = np.asarray(run(frames))
    assert out.shape == (2, 48, 64, 3)


def test_single_8k_config_monolithic(weights):
    from srcnn_cpp_tpu.configs import single_8k
    from srcnn_cpp_tpu.pipeline import upscale_bgr

    run = single_8k(weights)
    frame = np.random.default_rng(1).integers(0, 256, (20, 28, 3),
                                              dtype=np.uint8)
    out = run(frame)
    ref = np.asarray(upscale_bgr(frame, 2.0, weights))
    assert np.array_equal(out, ref)


def test_single_8k_config_meshed(weights):
    from srcnn_cpp_tpu.configs import single_8k
    from srcnn_cpp_tpu.parallel import make_mesh
    from srcnn_cpp_tpu.pipeline import upscale_bgr

    mesh = make_mesh(data=1, row=8)
    run = single_8k(weights, mesh=mesh)
    frame = np.random.default_rng(2).integers(0, 256, (32, 40, 3),
                                              dtype=np.uint8)
    out = run(frame)
    ref = np.asarray(upscale_bgr(frame, 2.0, weights, kernel="xla"))
    # tiled conv path is bit-exact vs the xla path; merge/color identical
    assert np.array_equal(out, ref)


def test_stream_config(weights):
    from srcnn_cpp_tpu.configs import stream_4k30

    up = stream_4k30(weights, kernel="xla", depth=1)
    f = np.full((16, 16, 3), 80, dtype=np.uint8)
    outs = [r for r in (up.push(f), up.push(f)) if r is not None]
    outs += list(up.drain())
    assert len(outs) == 2 and outs[0].shape == (32, 32, 3)
