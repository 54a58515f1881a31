"""Optimizer parity tests: bcnn_tpu.learner vs. a direct numpy transcription
of the reference's update math (src/bcnn_learner.c:29-131)."""

import jax.numpy as jnp
import numpy as np

from bcnn_tpu import Activation, FillerType, Mode, Net, Optimizer
from bcnn_tpu.compile import init_params
from bcnn_tpu.learner import apply_updates, init_opt_state, learning_rate
from bcnn_tpu.types import LrDecay


def ref_lr(learner, it):
    """Transcription of bcnn_update_learning_rate (bcnn_learner.c:29-65)."""
    base = learner.base_learning_rate
    if learner.decay_type == LrDecay.CONSTANT:
        return base
    if learner.decay_type == LrDecay.STEP:
        return base * learner.scale ** (it // learner.step)
    if learner.decay_type == LrDecay.INV:
        return base * (1.0 + learner.gamma * it) ** (-learner.power)
    if learner.decay_type == LrDecay.EXP:
        return base * learner.gamma**it
    if learner.decay_type == LrDecay.POLY:
        return base * (1 - it / learner.max_batches) ** learner.power
    if learner.decay_type == LrDecay.SIGMOID:
        return base * (1.0 / (1.0 + np.exp(learner.gamma * (it - learner.step))))


def build_tiny_net(optimizer):
    net = Net(Mode.TRAIN)
    net.set_input_shape(4, 4, 1, 2)
    if optimizer == Optimizer.SGD:
        net.set_sgd_optimizer(learning_rate=0.1, momentum=0.9)
    else:
        net.set_adam_optimizer(learning_rate=0.1)
    net.set_weight_regularizer(0.01)
    net.add_convolutional_layer(
        2, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "c1"
    )
    return net


def test_lr_schedules_match_reference():
    from bcnn_tpu.graph import Learner

    for dt, kw in [
        (LrDecay.CONSTANT, {}),
        (LrDecay.STEP, dict(scale=0.5, step=10)),
        (LrDecay.INV, dict(gamma=0.1, power=0.75)),
        (LrDecay.EXP, dict(gamma=0.99)),
        (LrDecay.POLY, dict(power=2.0, max_batches=100)),
        (LrDecay.SIGMOID, dict(gamma=0.1, step=50)),
    ]:
        ln = Learner(base_learning_rate=0.01, decay_type=dt, **kw)
        for it in [1, 5, 37, 99]:
            got = float(learning_rate(ln, jnp.int32(it)))
            want = ref_lr(ln, it)
            np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=str(dt))


def test_sgd_matches_reference_velocity_semantics():
    """v_t = g + decay*B*w + m*v_{t-1}; w -= lr/B * v_t for weights;
    biases same without decay (bcnn_sgd_update_cpu :67-83)."""
    net = build_tiny_net(Optimizer.SGD)
    params, _ = init_params(net, seed=0)
    opt = init_opt_state(net, params)
    lr, m, wd, B = 0.1, 0.9, 0.01, 2

    rng = np.random.RandomState(0)
    w_key = [t.key for t in net.param_specs() if t.key.endswith("_w")][0]
    b_key = [t.key for t in net.param_specs() if t.key.endswith("_b")][0]
    ref_w = np.asarray(params[w_key]).copy()
    ref_b = np.asarray(params[b_key]).copy()
    vel_w = np.zeros_like(ref_w)
    vel_b = np.zeros_like(ref_b)

    for step in range(3):
        g_w = rng.randn(*ref_w.shape).astype(np.float32)
        g_b = rng.randn(*ref_b.shape).astype(np.float32)
        grads = {w_key: jnp.asarray(g_w), b_key: jnp.asarray(g_b)}
        params, opt = apply_updates(net, params, grads, opt)
        # reference math
        vel_b = g_b + m * vel_b
        ref_b -= lr / B * vel_b
        vel_w = g_w + wd * B * ref_w + m * vel_w
        ref_w -= lr / B * vel_w
        np.testing.assert_allclose(
            np.asarray(params[b_key]), ref_b, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(params[w_key]), ref_w, rtol=1e-5, atol=1e-6
        )


def test_adam_matches_reference():
    """bcnn_adam_update_cpu :106-131: biases take the SGD rule; weights take
    Adam with eps added to sqrt(v) and mu from seen+1."""
    net = build_tiny_net(Optimizer.ADAM)
    params, _ = init_params(net, seed=0)
    opt = init_opt_state(net, params)
    lr, m, wd, B, b1, b2 = 0.1, 0.9, 0.01, 2, 0.9, 0.999

    rng = np.random.RandomState(1)
    w_key = [t.key for t in net.param_specs() if t.key.endswith("_w")][0]
    b_key = [t.key for t in net.param_specs() if t.key.endswith("_b")][0]
    ref_w = np.asarray(params[w_key]).copy().astype(np.float64)
    ref_b = np.asarray(params[b_key]).copy().astype(np.float64)
    vel_b = np.zeros_like(ref_b)
    am = np.zeros_like(ref_w)
    av = np.zeros_like(ref_w)
    seen = 0

    for step in range(3):
        g_w = rng.randn(*ref_w.shape).astype(np.float32)
        g_b = rng.randn(*ref_b.shape).astype(np.float32)
        grads = {w_key: jnp.asarray(g_w), b_key: jnp.asarray(g_b)}
        params, opt = apply_updates(net, params, grads, opt)
        # reference math
        seen += B
        mu = np.sqrt(1.0 - b2 ** (seen + 1)) / (1.0 - b1 ** (seen + 1))
        vel_b = g_b + m * vel_b
        ref_b -= lr / B * vel_b
        g = g_w + wd * B * ref_w
        am = (1 - b1) * g + b1 * am
        av = (1 - b2) * g * g + b2 * av
        ref_w -= lr / B * mu * am / (np.sqrt(av) + 1e-7)
        np.testing.assert_allclose(
            np.asarray(params[b_key]), ref_b, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(params[w_key]), ref_w, rtol=1e-4, atol=1e-5
        )


def test_bn_scales_not_updated():
    """The reference's conv update touches only weights+biases
    (bcnn_update_conv_layer :810-851); fused-BN scales stay at 1."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(4, 4, 1, 2)
    net.set_sgd_optimizer(0.1, 0.9)
    net.add_convolutional_layer(
        2, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0, "input", "c1"
    )
    params, _ = init_params(net, 0)
    opt = init_opt_state(net, params)
    scales_key = [t.key for t in net.param_specs() if "scales" in t.key][0]
    grads = {k: jnp.ones_like(v) for k, v in params.items()}
    params, opt = apply_updates(net, params, grads, opt)
    np.testing.assert_array_equal(np.asarray(params[scales_key]), 1.0)
