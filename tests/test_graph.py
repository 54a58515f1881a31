"""Graph builder semantics: name resolution, shape inference, wiring."""

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
)
from bcnn_tpu.graph import BuildError


def test_reverse_scan_name_resolution():
    """Latest tensor with a given name wins (bcnn_net.c:379-386)."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 3, 2)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0, "input", "x"
    )
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0, "x", "x"
    )
    # two tensors named "x"; lookup must return the later one
    idx = net.get_tensor_index_by_name("x")
    assert net.tensors[idx].name == "x"
    assert idx == max(
        i for i, t in enumerate(net.tensors) if t.name == "x"
    )


def test_conv_shape_inference():
    net = Net(Mode.TRAIN)
    net.set_input_shape(28, 28, 1, 16)
    net.add_convolutional_layer(
        32, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0, "input", "c1"
    )
    t = net.tensor("c1")
    assert (t.n, t.c, t.h, t.w) == (16, 32, 28, 28)
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    t = net.tensor("p1")
    assert (t.h, t.w) == (14, 14)
    net.add_maxpool_layer(2, 2, Padding.SAME, "p1", "p2")
    assert (net.tensor("p2").h, net.tensor("p2").w) == (7, 7)
    net.add_maxpool_layer(2, 2, Padding.VALID, "p2", "p3")
    assert (net.tensor("p3").h, net.tensor("p3").w) == (3, 3)
    net.add_maxpool_layer(3, 2, Padding.CAFFE, "p2", "p4")
    assert (net.tensor("p4").h, net.tensor("p4").w) == (3, 3)


def test_fc_cost_label_reshape():
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 1, 4)
    net.add_fullc_layer(10, FillerType.XAVIER, Activation.NONE, 0, "input", "f")
    assert net.tensor("f").shape == (4, 10, 1, 1)
    net.add_softmax_layer("f", "s")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "s")
    assert net.tensors[1].shape == (4, 10, 1, 1)  # label reshaped


def test_deconv_upsample_concat_shapes():
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 3, 2)
    net.add_deconvolutional_layer(
        6, 3, 2, 1, FillerType.XAVIER, Activation.NONE, "input", "d"
    )
    assert (net.tensor("d").h, net.tensor("d").w) == (15, 15)  # 2*(8-1)+3-2
    net.add_upsample_layer(2, "input", "u")
    assert (net.tensor("u").h, net.tensor("u").c) == (16, 3)
    net2 = Net(Mode.TRAIN)
    net2.set_input_shape(8, 8, 3, 2)
    net2.add_convolutional_layer(
        4, 1, 1, 0, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "a"
    )
    net2.add_convolutional_layer(
        5, 1, 1, 0, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "b"
    )
    net2.add_concat_layer(["a", "b"], "cat")
    assert net2.tensor("cat").c == 9


def test_invalid_src_raises():
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 3, 2)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "a"
    )
    with pytest.raises(BuildError):
        net.add_convolutional_layer(
            4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "nope", "b"
        )


def test_param_key_uniquification():
    """Two layers reading the same src create two '<src>_w' tensors; keys
    must stay unique while names keep reference semantics."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 3, 2)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "a"
    )
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "b"
    )
    keys = [t.key for t in net.param_specs()]
    assert len(keys) == len(set(keys))


def test_executor_value_hooks():
    """net.value_hooks ({tensor idx -> fn}) transforms a node's freshly
    produced value inside the traced program — the profiling/experiment
    surface (e.g. jax.lax.optimization_barrier to pin a fusion boundary,
    tools/attribution_experiments.py)."""
    from bcnn_tpu import Session
    from bcnn_tpu.compile import execute, output_value
    from bcnn_tpu.types import Mode as M

    def build():
        net = Net(Mode.PREDICT)
        net.set_input_shape(8, 8, 3, 2)
        net.add_convolutional_layer(
            4, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0,
            "input", "c1",
        )
        net.add_convolutional_layer(
            4, 1, 1, 0, 1, 0, FillerType.XAVIER, Activation.NONE, 0,
            "c1", "c2",
        )
        return net

    net = build()
    sess = Session(net, seed=3).compile_net()
    x = np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32)

    def run(n):
        ex = execute(n, sess.params, sess.state, {"input": x}, M.PREDICT)
        return np.asarray(output_value(ex, n.get_tensor_index_by_name("c2")))

    base = run(net)

    hooked = build()
    hooked.value_hooks = {
        hooked.get_tensor_index_by_name("c1"): lambda v: v * 2.0
    }
    doubled_mid = run(hooked)
    # c2 is linear in c1: doubling c1's value doubles c2
    np.testing.assert_allclose(doubled_mid, base * 2.0, rtol=1e-5)

    # identity-semantics hook (the barrier use case) changes nothing
    import jax

    barrier = build()
    barrier.value_hooks = {
        barrier.get_tensor_index_by_name("c1"): jax.lax.optimization_barrier
    }
    np.testing.assert_allclose(run(barrier), base, rtol=0, atol=0)
