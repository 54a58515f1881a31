"""Mixed-precision (bf16 MXU) TRAINING.

Round-1 restricted net.compute_dtype to PREDICT because JAX's conv
transpose rule rejects bf16 inputs with an fp32 cotangent. The custom
VJPs in ops/conv.py lift that: forward numerics identical to the bf16
inference path (fp32 accumulate/output), backward convs in bf16, fp32
master params/grads. The reference has no mixed-precision training at
all (fp32 only, bcnn_conv_layer.c:487-587) — this is TPU-added
capability, so the tests check self-consistency vs our fp32 path, not
reference parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnn_tpu import (
    Activation,
    FillerType,
    Loss,
    Metric,
    Mode,
    Net,
    Padding,
    Session,
)
from bcnn_tpu.compile import execute, make_train_step
from tests.test_train import lenet, synthetic_batch


def zoo_net(batch=4, size=16):
    """Net touching every compute_dtype consumer: conv(+BN+PReLU),
    depthwise conv, deconv, FC."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(size, size, 3, batch)
    net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.PRELU, 1,
        "input", "c1",
    )
    net.add_depthwise_conv_layer(
        3, 1, 1, 0, FillerType.XAVIER, Activation.RELU, "c1", "dw"
    )
    net.add_deconvolutional_layer(
        4, 2, 2, 0, FillerType.XAVIER, Activation.RELU, "dw", "dc"
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "dc", "p")
    net.add_fullc_layer(4, FillerType.XAVIER, Activation.NONE, 0, "p", "f")
    net.add_softmax_layer("f", "s")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "s")
    return net


def _grads(net, params, state, batch, rng):
    def loss_fn(p):
        ex = execute(net, p, state, batch, Mode.TRAIN, rng)
        return ex.surrogate

    return jax.grad(loss_fn)(params)


def test_bf16_grads_close_to_fp32():
    net = zoo_net()
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(1)
    x = rng.randn(4, 3, 16, 16).astype(np.float32)
    y = np.zeros((4, 4, 1, 1), np.float32)
    y[np.arange(4), rng.randint(0, 4, 4)] = 1.0
    batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
    key = jax.random.PRNGKey(0)

    g32 = _grads(net, sess.params, sess.state, batch, key)
    net.compute_dtype = jnp.bfloat16
    g16 = _grads(net, sess.params, sess.state, batch, key)

    for k in g32:
        a = np.asarray(g32[k]).ravel()
        b = np.asarray(g16[k]).ravel()
        assert b.dtype == np.float32, f"{k}: grad dtype {b.dtype}"
        # elementwise relative error is meaningless at PReLU/BN sign
        # boundaries; direction (cosine) + scale are what SGD feels
        if np.linalg.norm(a) == 0 and np.linalg.norm(b) == 0:
            # identically-zero grads on both sides (e.g. PReLU slopes at
            # the reference's zero init: the replicated output-based
            # backward keeps them frozen — ops/activations.py)
            continue
        cos = float(
            np.dot(a, b)
            / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )
        assert cos > 0.99, f"{k}: grad cosine {cos}"
        rms = float(np.sqrt((a**2).mean()))
        assert float(np.abs(a - b).max()) < 0.5 * rms + 1e-4, (
            f"{k}: maxabsdiff {np.abs(a - b).max()} vs rms {rms}"
        )


def test_bf16_training_converges_like_fp32():
    batch, size, classes = 16, 12, 4
    rng = np.random.RandomState(0)

    def run(bf16):
        net = lenet(batch, size, classes)
        if bf16:
            net.compute_dtype = jnp.bfloat16
        sess = Session(net, seed=0).compile_net()
        r = np.random.RandomState(7)
        errs = []
        for _ in range(40):
            x, y = synthetic_batch(r, batch, size, classes)
            errs.append(float(sess.train_on_batch(x, y)))
        # params stay fp32 masters
        for v in sess.params.values():
            assert v.dtype == jnp.float32
        return errs

    e32, e16 = run(False), run(True)
    assert e16[-1] <= 1.0, f"bf16 did not converge: {e16[-5:]}"
    assert e16[-1] <= e32[0], "bf16 training made no progress vs start"
    # same task solved: both end at (near-)zero error
    assert abs(e16[-1] - e32[-1]) <= 1.0


def test_bf16_train_step_jits_and_runs():
    net = zoo_net()
    net.compute_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    step = make_train_step(net)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    y = jnp.zeros((4, 4, 1, 1), jnp.float32).at[:, 0, 0, 0].set(1.0)
    params, state, opt, loss = step(
        sess.params, sess.state, sess.opt_state,
        {"input": x, "label": y}, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))
    for v in params.values():
        assert v.dtype == jnp.float32


def test_bf16_forward_matches_predict_path():
    # TRAIN-mode conv forward with compute_dtype must produce the same
    # numerics as the (already-shipped, parity-covered) PREDICT bf16 path:
    # same bf16 inputs, fp32 accumulate/output.
    from bcnn_tpu.ops.conv import _conv2d_mixed, _conv_raw
    from jax import lax

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    y_train = _conv2d_mixed(x, w, 1, 1, 1, jnp.dtype(jnp.bfloat16))
    y_pred = _conv_raw(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), 1, 1, 1,
        lax.Precision.DEFAULT, jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(y_train), np.asarray(y_pred))


def test_bf16_with_remat():
    """jax.checkpoint over the custom conv VJPs (large-model training
    combines both: bf16 MXU + rematerialized backward)."""
    net = zoo_net()
    net.compute_dtype = jnp.bfloat16
    net.remat = True
    sess = Session(net, seed=0).compile_net()
    step = make_train_step(net)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    y = jnp.zeros((4, 4, 1, 1), jnp.float32).at[:, 1, 0, 0].set(1.0)
    params, state, opt, loss = step(
        sess.params, sess.state, sess.opt_state,
        {"input": x, "label": y}, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))


def test_act16_grads_close_to_fp32():
    """net.train_act_dtype = bf16: inter-layer activations (and therefore
    the backward's cotangent chain) are stored bf16. Direction/scale of
    the grads must survive; thresholds slightly looser than the
    compute_dtype-only test because the activation storage itself is
    quantized here."""
    net = zoo_net()
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(1)
    x = rng.randn(4, 3, 16, 16).astype(np.float32)
    y = np.zeros((4, 4, 1, 1), np.float32)
    y[np.arange(4), rng.randint(0, 4, 4)] = 1.0
    batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
    key = jax.random.PRNGKey(0)

    g32 = _grads(net, sess.params, sess.state, batch, key)
    net.compute_dtype = jnp.bfloat16
    net.train_act_dtype = jnp.bfloat16
    g16 = _grads(net, sess.params, sess.state, batch, key)

    for k in g32:
        a = np.asarray(g32[k]).ravel()
        b = np.asarray(g16[k]).ravel()
        assert b.dtype == np.float32, f"{k}: grad dtype {b.dtype}"
        if np.linalg.norm(a) == 0 and np.linalg.norm(b) == 0:
            continue
        cos = float(
            np.dot(a, b)
            / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )
        assert cos > 0.98, f"{k}: grad cosine {cos}"
        rms = float(np.sqrt((a**2).mean()))
        assert float(np.abs(a - b).max()) < 0.7 * rms + 1e-4, (
            f"{k}: maxabsdiff {np.abs(a - b).max()} vs rms {rms}"
        )


def test_act16_training_converges_like_fp32():
    batch, size, classes = 16, 12, 4

    def run(act16):
        net = lenet(batch, size, classes)
        if act16:
            net.compute_dtype = jnp.bfloat16
            net.train_act_dtype = jnp.bfloat16
        sess = Session(net, seed=0).compile_net()
        r = np.random.RandomState(7)
        errs = []
        for _ in range(40):
            x, y = synthetic_batch(r, batch, size, classes)
            errs.append(float(sess.train_on_batch(x, y)))
        for v in sess.params.values():
            assert v.dtype == jnp.float32
        return errs

    e32, e16 = run(False), run(True)
    assert e16[-1] <= 1.0, f"act16 did not converge: {e16[-5:]}"
    assert abs(e16[-1] - e32[-1]) <= 1.0


def test_act16_standalone_bn_stats_stay_fp32():
    """Standalone [bn] consuming a bf16 boundary: the executor upcasts so
    the exact-quirk BN backward and running stats run in fp32."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 3, 4)
    net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0,
        "input", "c1",
    )
    net.add_batchnorm_layer("c1", "b1")
    net.add_fullc_layer(4, FillerType.XAVIER, Activation.NONE, 0, "b1", "f")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "f")
    net.compute_dtype = jnp.bfloat16
    net.train_act_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 3, 8, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(4, 4, 1, 1).astype(np.float32))
    step = make_train_step(net)
    params, state, opt, loss = step(
        sess.params, sess.state, sess.opt_state,
        {"input": x, "label": y}, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))
    for k, v in state.items():
        assert v.dtype == jnp.float32, f"{k}: state dtype {v.dtype}"


def test_bf16_train_scan():
    """lax.scan over steps with the custom conv VJPs inside."""
    from bcnn_tpu.compile import make_train_scan

    net = zoo_net()
    net.compute_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    scan = make_train_scan(net)
    rng = np.random.RandomState(5)
    xs = jnp.asarray(rng.randn(3, 4, 3, 16, 16).astype(np.float32))
    ys = jnp.zeros((3, 4, 4, 1, 1), jnp.float32).at[:, :, 0, 0, 0].set(1.0)
    params, state, opt, losses = scan(
        sess.params, sess.state, sess.opt_state,
        {"input": xs, "label": ys}, jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(losses)).all()


def test_act16_joiner_boundaries_and_no_compute_dtype():
    """Regression (round-3 review): (a) eltwise/concat outputs must carry
    the reduced storage dtype too — residual/concat trunks are exactly
    the high-traffic boundaries train_act_dtype exists for; (b) the
    act-dtype knobs must work WITHOUT compute_dtype (stored bf16
    activations upcast at the fp32 conv/deconv, which previously crashed
    lax.conv_general_dilated on mixed dtypes)."""
    def branched(with_compute):
        net = Net(Mode.TRAIN)
        net.set_input_shape(16, 16, 3, 2)
        net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
        net.add_convolutional_layer(
            8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0,
            "input", "a",
        )
        net.add_convolutional_layer(
            8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0,
            "a", "b",
        )
        net.add_eltwise_layer(Activation.RELU, "b", "a", "e")
        net.add_concat_layer(["e", "a"], "cat")
        net.add_fullc_layer(
            4, FillerType.XAVIER, Activation.NONE, 0, "cat", "f"
        )
        net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "f")
        net.train_act_dtype = jnp.bfloat16
        if with_compute:
            net.compute_dtype = jnp.bfloat16
        return net

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 4, 1, 1).astype(np.float32))
    for with_compute in (True, False):
        net = branched(with_compute)
        sess = Session(net, seed=0).compile_net()
        ex = execute(
            net, sess.params, sess.state,
            {"input": jnp.zeros((2, 3, 16, 16))}, Mode.TRAIN, None,
        )
        for name in ("e", "cat"):
            i = net.get_tensor_index_by_name(name)
            assert ex.values[i].dtype == jnp.bfloat16, (
                name, with_compute, ex.values[i].dtype
            )
        step = make_train_step(net)
        params, state, opt, loss = step(
            sess.params, sess.state, sess.opt_state,
            {"input": x, "label": y}, jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(loss)), (with_compute, float(loss))
