"""Quantization-aware training (QAT).

The reference reserves a `quantize` flag on its conv builder
(inc/bcnn/bcnn.h, bcnn_add_convolutional_layer) but never implements it;
the rebuild makes it real (ops/quant.py): fake-quant + straight-through
estimator on conv/fc inputs and weights during TRAIN/VALID, activation
ranges tracked as EMA abs-max in state, and qat_export() freezing the
trained net into the SAME net.quant dict the int8 PTQ serving path
consumes (so the activation-flow plan and AOT export are reused as-is).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bcnn_tpu import Mode, Session
from bcnn_tpu.compile import make_forward, make_train_step
from bcnn_tpu.graph import Net
from bcnn_tpu.ops.quant import fake_quant_ste, qat_state_keys
from bcnn_tpu.types import (
    Activation,
    FillerType,
    Loss,
    Metric,
    Padding,
)


def _small_net(batch, qat=True, bn=False):
    net = Net(Mode.TRAIN)
    net.set_input_shape(12, 12, 3, batch)
    net.set_sgd_optimizer(learning_rate=0.02, momentum=0.9)
    X = FillerType.XAVIER
    net.add_convolutional_layer(
        16, 3, 1, 1, 1, int(bn), X, Activation.RELU, 0, "input", "c1"
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_convolutional_layer(
        32, 3, 1, 1, 1, int(bn), X, Activation.RELU, 0, "p1", "c2"
    )
    net.add_fullc_layer(4, X, Activation.NONE, 0, "c2", "fc")
    net.add_softmax_layer("fc", "sm")
    net.add_cost_layer(
        Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "sm", "label", "cost"
    )
    if qat:
        net.qat = True
    return net


def _task_batch(rng, n):
    """Linearly separable 4-class synthetic task."""
    lab = rng.randint(0, 4, n)
    x = rng.randn(n, 3, 12, 12).astype(np.float32) * 0.1
    for i, c in enumerate(lab):
        x[i, c % 3, 2 * c : 2 * c + 4, 2 * c : 2 * c + 4] += 1.5
    y = np.zeros((n, 4, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return x, y


# --------------------------------------------------------------------- #
# Primitive
# --------------------------------------------------------------------- #


def test_fake_quant_ste_forward_and_grad():
    scale = jnp.float32(0.1)
    x = jnp.asarray([0.04, -0.26, 12.6, 12.8, -14.0], jnp.float32)

    y = fake_quant_ste(x, scale)
    # forward snaps to the int8 grid, saturating at +-127*scale
    np.testing.assert_allclose(
        np.asarray(y), [0.0, -0.3, 12.6, 12.7, -12.7], rtol=0, atol=1e-6
    )
    # clipped STE: identity gradient inside the representable range,
    # zero outside
    g = jax.grad(lambda v: jnp.sum(fake_quant_ste(v, scale)))(x)
    np.testing.assert_array_equal(np.asarray(g), [1, 1, 1, 0, 0])


def test_fake_quant_per_channel_weight_grid():
    from bcnn_tpu.ops.quant import fake_quant_weight

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16), jnp.float32)
    wq = fake_quant_weight(w, (0, 1, 2))
    amax = np.abs(np.asarray(w)).max(axis=(0, 1, 2))
    # every value sits on its channel's int8 grid
    steps = np.asarray(wq) / (amax / 127.0)
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)
    assert np.all(np.abs(steps) <= 127)


# --------------------------------------------------------------------- #
# Training integration
# --------------------------------------------------------------------- #


def test_qat_state_created_and_ema_updates():
    batch = 16
    net = _small_net(batch)
    sess = Session(net, seed=0).compile_net()
    keys = qat_state_keys(net)
    assert keys and all(k in sess.state for k in keys)
    assert all(float(sess.state[k]) == 0.0 for k in keys)

    step = make_train_step(net)
    x, y = _task_batch(np.random.RandomState(0), batch)
    p, st, o, _ = step(
        sess.params, sess.state,
        sess.opt_state, {"input": x, "label": y}, jax.random.PRNGKey(0),
    )
    amax0 = {k: float(st[k]) for k in keys}
    assert all(v > 0 for v in amax0.values())

    # VALID runs frozen: state comes back unchanged
    fwd = make_forward(net, ["sm"], Mode.VALID)
    _, st2 = fwd(p, st, {"input": x, "label": y})
    for k in keys:
        assert float(st2[k]) == amax0[k]


def test_qat_training_converges():
    batch = 16
    net = _small_net(batch, bn=True)
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(1)
    err = 1.0
    for _ in range(60):
        x, y = _task_batch(rng, batch)
        err = float(sess.train_on_batch(x, y))
        if err == 0.0:
            break
    assert err == 0.0, f"QAT training failed to converge (err={err})"


def test_qat_export_matches_simulated_int8():
    """The deployed int8 program (qat_export -> net.quant -> PREDICT)
    computes what training simulated: outputs match the VALID fake-quant
    forward tightly on a BN-free net (the int8 conv's int32 accumulate of
    grid values == the fp32 conv of the dequantized grid, exactly)."""
    batch = 16
    net = _small_net(batch, bn=False)
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(2)
    for _ in range(30):
        x, y = _task_batch(rng, batch)
        sess.train_on_batch(x, y)

    xe, ye = _task_batch(np.random.RandomState(99), batch)
    fwd_valid = make_forward(net, ["sm"], Mode.VALID)
    (sim,), _ = fwd_valid(sess.params, sess.state, {"input": xe})

    quant = sess.freeze_qat()
    assert quant["weights"] and quant["act_scales"]
    fwd_int8 = make_forward(net, ["sm"], Mode.PREDICT)
    (deployed,), _ = fwd_int8(sess.params, sess.state, {"input": xe})

    np.testing.assert_allclose(
        np.asarray(sim), np.asarray(deployed), rtol=1e-4, atol=1e-5
    )
    # and the deployed int8 net solves the task the QAT run trained for
    pred = np.asarray(deployed).reshape(batch, 4).argmax(1)
    assert (pred == np.asarray(ye).reshape(batch, 4).argmax(1)).mean() == 1.0


def test_qat_int8_accuracy_no_loss_vs_fp32():
    """After QAT, exporting to int8 costs NO accuracy on the trained
    task (that is the point of QAT vs post-hoc PTQ)."""
    batch = 16
    net = _small_net(batch, bn=True)
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(3)
    # fixed step count (no early break): PREDICT uses BN RUNNING stats,
    # which need ~dozens of steps of the 0.9-momentum EMA to settle
    for _ in range(100):
        x, y = _task_batch(rng, batch)
        sess.train_on_batch(x, y)

    xe, ye = _task_batch(np.random.RandomState(123), batch)
    lab = np.asarray(ye).reshape(batch, 4).argmax(1)

    (fp32_out,), _ = make_forward(net, ["sm"], Mode.PREDICT)(
        sess.params, sess.state, {"input": xe}
    )
    fp32 = np.asarray(fp32_out).reshape(batch, 4).argmax(1)

    sess.freeze_qat()  # net.quant now set: PREDICT takes the int8 path
    (int8_out,), _ = make_forward(net, ["sm"], Mode.PREDICT)(
        sess.params, sess.state, {"input": xe}
    )
    int8 = np.asarray(int8_out).reshape(batch, 4).argmax(1)

    assert (int8 == lab).mean() >= (fp32 == lab).mean()
    assert (int8 == lab).mean() == 1.0
