"""The C-style API shim: a verbatim port of the reference mnist example's
create_network (examples/mnist/mnist_example.c:30-55) must build and train."""

import numpy as np

from bcnn_tpu.capi import *  # noqa: F403


def test_reference_style_program():
    net = bcnn_init_net(BCNN_MODE_TRAIN)  # noqa: F405
    bcnn_set_input_shape(net, 28, 28, 1, 16)  # noqa: F405
    bcnn_add_convolutional_layer(  # noqa: F405
        net, 32, 3, 1, 1, 1, 0, BCNN_FILLER_XAVIER, BCNN_ACT_RELU, 0,  # noqa
        "input", "conv1",
    )
    bcnn_add_batchnorm_layer(net, "conv1", "bn1")  # noqa: F405
    bcnn_add_maxpool_layer(  # noqa: F405
        net, 2, 2, BCNN_PADDING_SAME, "bn1", "pool1"  # noqa: F405
    )
    bcnn_add_fullc_layer(  # noqa: F405
        net, 10, BCNN_FILLER_XAVIER, BCNN_ACT_RELU, 0, "pool1", "fc2"  # noqa
    )
    bcnn_add_softmax_layer(net, "fc2", "softmax")  # noqa: F405
    bcnn_add_cost_layer(  # noqa: F405
        net, BCNN_LOSS_EUCLIDEAN, BCNN_METRIC_ERROR_RATE, 1.0,  # noqa: F405
        "softmax", "label", "cost",
    )
    bcnn_set_sgd_optimizer(net, 0.003, 0.9)  # noqa: F405
    bcnn_set_learning_rate_policy(  # noqa: F405
        net, BCNN_LR_DECAY_SIGMOID, 0.00002, 0.0, 0.0, 50000, 40000  # noqa
    )
    bcnn_set_weight_regularizer(net, 0.0005)  # noqa: F405
    bcnn_augment_data_with_shift(net, 5, 5)  # noqa: F405
    bcnn_augment_data_with_rotation(net, 30.0)  # noqa: F405
    bcnn_compile_net(net)  # noqa: F405

    x = np.random.RandomState(0).randn(16, 1, 28, 28).astype(np.float32)
    y = np.zeros((16, 10, 1, 1), np.float32)
    y[:, 3] = 1
    loss = net.train_on_batch(x, y)
    assert np.isfinite(float(loss))
    bcnn_set_mode(net, BCNN_MODE_VALID)  # noqa: F405
    outs, err = net.predict_on_batch(x, y)
    assert np.isfinite(float(err))
    bcnn_end_net(net)  # noqa: F405


def test_split_phase_matches_fused_step():
    """forward+backward+update must equal train_on_batch."""
    net1 = bcnn_init_net(BCNN_MODE_TRAIN)  # noqa: F405
    net2 = bcnn_init_net(BCNN_MODE_TRAIN)  # noqa: F405
    for net in (net1, net2):
        bcnn_set_input_shape(net, 8, 8, 1, 4)  # noqa: F405
        bcnn_add_convolutional_layer(  # noqa: F405
            net, 4, 3, 1, 1, 1, 0, BCNN_FILLER_XAVIER,  # noqa: F405
            BCNN_ACT_RELU, 0, "input", "c",  # noqa: F405
        )
        bcnn_add_fullc_layer(  # noqa: F405
            net, 3, BCNN_FILLER_XAVIER, BCNN_ACT_NONE, 0, "c", "f"  # noqa
        )
        bcnn_add_softmax_layer(net, "f", "s")  # noqa: F405
        bcnn_add_cost_layer(  # noqa: F405
            net, BCNN_LOSS_EUCLIDEAN, BCNN_METRIC_SSE, 1.0,  # noqa: F405
            "s", "label", "cost",
        )
        bcnn_set_sgd_optimizer(net, 0.01, 0.9)  # noqa: F405
        bcnn_compile_net(net)  # noqa: F405
    x = np.random.RandomState(1).randn(4, 1, 8, 8).astype(np.float32)
    y = np.zeros((4, 3, 1, 1), np.float32)
    y[:, 1] = 1
    net1.train_on_batch(x, y)

    loss = net2.forward(x, y)
    assert np.isfinite(float(loss))
    net2.backward()
    net2.update()
    # activations accessible after forward
    s_val = net2.get_tensor_value("s")
    np.testing.assert_allclose(s_val.reshape(4, 3).sum(1), 1.0, rtol=1e-4)
    for k in net1.params:
        np.testing.assert_allclose(
            np.asarray(net1.params[k]), np.asarray(net2.params[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
