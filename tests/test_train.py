"""End-to-end training: a LeNet-style net (the mnist example's architecture,
examples/mnist/mnist_example.c:30-55) must fit a small synthetic problem."""

import jax
import numpy as np

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


def lenet(batch=16, size=12, classes=4):
    net = Net(Mode.TRAIN)
    net.set_input_shape(size, size, 1, batch)
    net.set_sgd_optimizer(learning_rate=0.05, momentum=0.9)
    net.set_weight_regularizer(0.0005)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0, "input", "c1"
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_convolutional_layer(
        16, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0, "p1", "c2"
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "c2", "p2")
    net.add_fullc_layer(32, FillerType.XAVIER, Activation.RELU, 0, "p2", "f1")
    net.add_fullc_layer(
        classes, FillerType.XAVIER, Activation.NONE, 0, "f1", "f2"
    )
    net.add_softmax_layer("f2", "s")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "s")
    return net


def synthetic_batch(rng, batch, size, classes):
    """Each class is a distinct bright quadrant + noise."""
    labels = rng.randint(0, classes, batch)
    x = rng.randn(batch, 1, size, size).astype(np.float32) * 0.1
    h = size // 2
    for i, c in enumerate(labels):
        r, col = divmod(c, 2)
        x[i, 0, r * h : (r + 1) * h, col * h : (col + 1) * h] += 1.0
    y = np.zeros((batch, classes, 1, 1), np.float32)
    y[np.arange(batch), labels] = 1.0
    return x, y


def test_train_on_batch_learns():
    batch, size, classes = 16, 12, 4
    net = lenet(batch, size, classes)
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(0)

    first_err = None
    for step in range(60):
        x, y = synthetic_batch(rng, batch, size, classes)
        err = float(sess.train_on_batch(x, y))
        if first_err is None:
            first_err = err
    # evaluate
    net.set_mode(Mode.VALID)
    x, y = synthetic_batch(rng, batch, size, classes)
    outs, loss = sess.predict_on_batch(x, y)
    final_err = float(loss)
    assert final_err <= 1, f"err {first_err} -> {final_err}, not learning"
    probs = np.asarray(outs[0]).reshape(batch, classes)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_running_stats_update_only_in_train():
    net = lenet()
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(1)
    x, y = synthetic_batch(rng, 16, 12, 4)
    state_keys = list(sess.state)
    assert any("run_mean" in k for k in state_keys)
    before = {k: np.asarray(v).copy() for k, v in sess.state.items()}
    sess.train_on_batch(x, y)
    after_train = {k: np.asarray(v) for k, v in sess.state.items()}
    changed = any(
        not np.array_equal(before[k], after_train[k]) for k in state_keys
    )
    assert changed, "running stats must move in TRAIN"
    net.set_mode(Mode.VALID)
    sess.predict_on_batch(x, y)
    after_valid = {k: np.asarray(v) for k, v in sess.state.items()}
    for k in state_keys:
        np.testing.assert_array_equal(after_train[k], after_valid[k])


def test_dropout_only_in_train():
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 2, 4)
    net.set_sgd_optimizer(0.01, 0.9)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "c"
    )
    net.add_dropout_layer(0.5, "c")
    sess = Session(net, seed=0).compile_net()
    x = np.random.RandomState(2).randn(4, 2, 8, 8).astype(np.float32)
    net.set_mode(Mode.VALID)
    (out1,), _ = sess.predict_on_batch(x, outputs=["c"])
    (out2,), _ = sess.predict_on_batch(x, outputs=["c"])
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def _residual_net(ref_routing=True):
    net = Net(Mode.TRAIN)
    net.ref_grad_routing = ref_routing
    net.set_input_shape(8, 8, 2, 4)
    net.set_sgd_optimizer(0.05, 0.0)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0,
        "input", "t0",
    )
    # t0 feeds BOTH a conv (overwriting backward in the reference) and a
    # later eltwise shortcut (accumulating backward)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0, "t0", "t1"
    )
    net.add_eltwise_layer(Activation.NONE, "t1", "t0", "t2")
    net.add_fullc_layer(
        4, FillerType.XAVIER, Activation.NONE, 0, "t2", "f"
    )
    net.add_softmax_layer("f", "s")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "s")
    return net


def test_ref_grad_routing_drops_skip_gradient():
    """compile.build_grad_routing replicates the reference's backward
    buffer semantics: a conv consumer's dX OVERWRITES the skip path's
    accumulated gradient (col2im zero-fill, bcnn_mat.c), so with
    ref_grad_routing (default ON) the first conv trains as if the eltwise
    shortcut contributed no gradient; ref_grad_routing=False restores
    true autodiff accumulation and must differ. The ON semantics are
    pinned bit-level against the compiled reference by
    tests/test_training_parity.py (seed-40 two-step weight parity)."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 2, 8, 8).astype(np.float32)
    y = np.zeros((4, 4, 1, 1), np.float32)
    y[np.arange(4), rng.randint(0, 4, 4)] = 1.0

    updated = {}
    for flag in (True, False):
        net = _residual_net(flag)
        sess = Session(net, seed=0).compile_net()
        # FIRST conv's weights: the reference names weights after the
        # SRC tensor ("%s_w"), so conv(input->t0) owns "input_w"
        w_before = np.asarray(sess.params["input_w"]).copy()
        sess.train_on_batch(x, y)
        updated[flag] = np.asarray(sess.params["input_w"]) - w_before
        # the net still learns either way
        assert np.abs(updated[flag]).max() > 0
    # routing changes the first conv's gradient (skip edge dropped)
    assert not np.allclose(updated[True], updated[False], atol=1e-7)

    # sanity: with only ACCUMULATING consumers (maxpool + eltwise) the
    # routing plan is empty and both flags give identical grads
    from bcnn_tpu.compile import build_grad_routing

    net = _residual_net(True)
    plan = build_grad_routing(net)
    assert plan, "conv+eltwise branch must be in the routing plan"


def _bn_free_lenet(batch=16, size=12, classes=4):
    """lenet() without BN: gradient accumulation must be EXACT here
    (grads/metrics are batch sums; no batch-coupled op)."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(size, size, 1, batch)
    net.set_sgd_optimizer(learning_rate=0.05, momentum=0.9)
    net.set_weight_regularizer(0.0005)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0, "input", "c1"
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_fullc_layer(32, FillerType.XAVIER, Activation.RELU, 0, "p1", "f1")
    net.add_fullc_layer(
        classes, FillerType.XAVIER, Activation.NONE, 0, "f1", "f2"
    )
    net.add_softmax_layer("f2", "s")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "s")
    return net


def test_grad_accumulation_matches_full_batch():
    """make_train_step(accum_steps=4): microbatched scan with summed
    gradients and ONE optimizer update == the full-batch step, exactly
    (batch-sum semantics), over a multi-step trajectory."""
    from bcnn_tpu.compile import make_train_step

    batch, size, classes = 16, 12, 4
    rng = np.random.RandomState(7)
    batches = [synthetic_batch(rng, batch, size, classes) for _ in range(3)]
    key = jax.random.PRNGKey(5)

    results = []
    for accum in (1, 4):
        net = _bn_free_lenet(batch, size, classes)
        sess = Session(net, seed=0).compile_net()
        step = make_train_step(net, accum_steps=accum)
        p, st, o = sess.params, sess.state, sess.opt_state
        losses = []
        for x, y in batches:
            p, st, o, loss = step(
                p, st, o, {"input": x, "label": y}, key
            )
            losses.append(float(loss))
        results.append((jax.tree.map(np.asarray, p), losses))

    (p_full, l_full), (p_acc, l_acc) = results
    np.testing.assert_allclose(l_full, l_acc, rtol=1e-5)
    for k in p_full:
        np.testing.assert_allclose(
            p_full[k], p_acc[k], rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_grad_accumulation_trains_with_bn():
    """With BN the accumulated step uses per-microbatch batch stats (the
    standard semantics, same as pipeline microbatching): not bit-equal to
    full batch, but a valid training program that still fits the task."""
    from bcnn_tpu.compile import make_train_step

    batch, size, classes = 16, 12, 4
    net = lenet(batch, size, classes)
    net.accum_steps = 2  # via the net attribute this time
    sess = Session(net, seed=0).compile_net()
    step = make_train_step(net)
    p, st, o = sess.params, sess.state, sess.opt_state
    rng = np.random.RandomState(8)
    err = None
    for i in range(50):
        x, y = synthetic_batch(rng, batch, size, classes)
        p, st, o, loss = step(
            p, st, o, {"input": x, "label": y}, jax.random.PRNGKey(i)
        )
        err = float(loss)
        if err == 0.0:
            break
    assert err == 0.0, f"accumulated training failed to converge ({err})"


def test_grad_accumulation_rejects_indivisible():
    from bcnn_tpu.compile import make_train_step

    net = _bn_free_lenet(16)
    try:
        make_train_step(net, accum_steps=3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
