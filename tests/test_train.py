"""Training step: loss decreases, sharded == single-device gradients."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (4, 32, 32), dtype=np.uint8)
    # target: a slightly sharpened copy, so there is something to learn
    t = np.clip(x.astype(np.float32) * 1.02 - 2.0, 0, 255)
    return x, t


def test_loss_decreases(weights, batch):
    import optax

    from srcnn_cpp_tpu.train import make_train_step, mse_loss

    x, t = batch
    opt = optax.sgd(1e-9)  # 0-255 domain: gradients are huge, lr tiny
    step = make_train_step(opt)
    w = weights
    state = opt.init(w)
    l0 = float(mse_loss(w, x, t))
    for _ in range(3):
        w, state, loss = step(w, state, x, t)
    l1 = float(mse_loss(w, x, t))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0


def test_sharded_step_matches_single_device(weights, batch):
    import optax

    from srcnn_cpp_tpu.parallel import make_mesh
    from srcnn_cpp_tpu.train import make_sharded_train_step, make_train_step
    from srcnn_cpp_tpu.train.step import shard_batch

    x, t = batch  # B=4 over data=2, H=32 over row=4
    mesh = make_mesh(data=2, row=4)
    opt = optax.sgd(1e-9)

    w1, s1 = weights, opt.init(weights)
    w2, s2 = weights, opt.init(weights)
    single = make_train_step(opt)
    sharded = make_sharded_train_step(mesh, opt)

    xs, ts = shard_batch(mesh, x), shard_batch(mesh, t)
    w1, s1, loss1 = single(w1, s1, x, t)
    w2, s2, loss2 = sharded(w2, s2, xs, ts)

    assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
    for k in ("conv1_w", "conv2_w", "conv3_w", "conv1_b", "conv2_b", "conv3_b"):
        # compare the *updates*: fp32 reduction order differs between the
        # tiled and monolithic forwards, so allow small relative error on
        # the step taken, not on the (much larger) weight values
        d1 = np.asarray(getattr(w1, k)) - np.asarray(getattr(weights, k))
        d2 = np.asarray(getattr(w2, k)) - np.asarray(getattr(weights, k))
        scale = np.abs(d1).max() + 1e-30
        np.testing.assert_allclose(d1 / scale, d2 / scale, atol=5e-3,
                                   err_msg=k)


def test_sharded_loss_runs_multiple_steps(weights, batch):
    import optax

    from srcnn_cpp_tpu.parallel import make_mesh
    from srcnn_cpp_tpu.train import make_sharded_train_step
    from srcnn_cpp_tpu.train.step import shard_batch

    x, t = batch
    mesh = make_mesh(data=2, row=4)
    opt = optax.adam(1e-6)
    step = make_sharded_train_step(mesh, opt)
    w, s = weights, opt.init(weights)
    xs, ts = shard_batch(mesh, x), shard_batch(mesh, t)
    losses = []
    for _ in range(3):
        w, s, loss = step(w, s, xs, ts)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
