"""Data-parallel tests on the faked 8-device CPU mesh (SURVEY.md §4:
multi-device tests without a pod)."""

import jax
import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import lenet_mnist
from bcnn_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def _batch(rng, n):
    lab = rng.randint(0, 10, n)
    x = rng.randn(n, 1, 28, 28).astype(np.float32) * 0.1
    for i, c in enumerate(lab):
        x[i, 0, c : c + 8, c : c + 8] += 1.0
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return x, y


def test_dp_train_step_matches_single_device(mesh8):
    """The DP step over 8 devices must produce the same parameters as the
    single-device step — the loss is a global batch sum, so GSPMD's psum
    reproduces single-device math exactly (SURVEY.md §2.8)."""
    batch = 16
    rng = np.random.RandomState(0)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(42)

    # single-device
    net1 = lenet_mnist(batch)
    s1 = Session(net1, seed=0).compile_net()
    from bcnn_tpu.compile import make_train_step

    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state,
        {"input": x, "label": y}, rngkey,
    )

    # 8-device DP
    net8 = lenet_mnist(batch)
    s8 = Session(net8, seed=0).compile_net()
    step8 = make_dp_train_step(net8, mesh8)
    p = replicate(mesh8, s8.params)
    st = replicate(mesh8, s8.state)
    o = replicate(mesh8, s8.opt_state)
    k = replicate(mesh8, rngkey)
    bt = shard_batch(mesh8, {"input": x, "label": y})
    p8, st8, o8, loss8 = step8(p, st, o, bt, k)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]),
            np.asarray(p8[key]),
            rtol=1e-4,
            atol=1e-5,
            err_msg=key,
        )
    for key in st1:
        np.testing.assert_allclose(
            np.asarray(st1[key]), np.asarray(st8[key]), rtol=1e-4, atol=1e-6
        )


def test_dp_forward_matches_single_device(mesh8):
    """Batch-sharded inference equals single-device inference."""
    from bcnn_tpu import Mode
    from bcnn_tpu.parallel import make_dp_forward, replicate, shard_batch

    net = lenet_mnist(16, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    x = np.random.RandomState(7).randn(16, 1, 28, 28).astype(np.float32)
    (ref,), _ = sess.predict_on_batch(x, outputs=["softmax"])

    fwd = make_dp_forward(net, mesh8, ["softmax"], Mode.PREDICT)
    p = replicate(mesh8, sess.params)
    s = replicate(mesh8, sess.state)
    batch = shard_batch(mesh8, {"input": x})
    (got,) = fwd(p, s, batch)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-6
    )


def test_spatial_forward_matches_single_device(mesh8):
    """Height-sharded inference (halo exchange inserted by GSPMD) must
    equal the unsharded forward."""
    from bcnn_tpu.models import cifar10_convnet
    from bcnn_tpu import Mode
    from bcnn_tpu.parallel import make_spatial_forward

    net = cifar10_convnet(batch_size=2, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    x = np.random.RandomState(3).randn(2, 3, 32, 32).astype(np.float32)
    (ref,), _ = sess.predict_on_batch(x, outputs=["softmax"])

    fwd = make_spatial_forward(net, mesh8, ["softmax"])
    (got,) = fwd(sess.params, sess.state, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_session_mesh_integration(mesh8):
    """Session(net, mesh=...) trains DP transparently and matches the
    explicit single-device Session."""
    rng = np.random.RandomState(5)
    x, y = _batch(rng, 16)

    s1 = Session(lenet_mnist(16), seed=0).compile_net()
    s8 = Session(lenet_mnist(16), seed=0, mesh=mesh8).compile_net()
    s8._rng = s1._rng
    l1 = float(s1.train_on_batch(x, y))
    l8 = float(s8.train_on_batch(x, y))
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[k]), np.asarray(s8.params[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
    # predict path still works on the replicated params
    s8.net.set_mode(Mode.VALID)
    _, err = s8.predict_on_batch(x, y)
    assert np.isfinite(float(err))


def test_dp_multiple_steps_converge(mesh8):
    batch = 32
    net = lenet_mnist(batch)
    sess = Session(net, seed=0).compile_net()
    step = make_dp_train_step(net, mesh8)
    p = replicate(mesh8, sess.params)
    st = replicate(mesh8, sess.state)
    o = replicate(mesh8, sess.opt_state)
    rng = np.random.RandomState(1)
    losses = []
    for i in range(8):
        x, y = _batch(rng, batch)
        bt = shard_batch(mesh8, {"input": x, "label": y})
        k = replicate(mesh8, jax.random.PRNGKey(i))
        p, st, o, loss = step(p, st, o, bt, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
