"""bcnn2tflite: exported flatbuffer must reproduce the framework's forward
(the reference's CHECK_REFERENCE self-check, bcnn2tflite.cc:27)."""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_tflite_cli_conf_weights(tmp_path):
    """The tool's CLI path: .conf + .bcnnmodel -> .tflite."""
    from bcnn2tflite import main

    from bcnn_tpu import Mode, Net, Session, save_weights
    from bcnn_tpu.config import load_net

    conf = tmp_path / "n.conf"
    conf.write_text(
        """
[net]
input_width=8
input_height=8
input_channels=3
batch_size=1

[conv]
filters=4
size=3
stride=1
pad=1
activation=relu
src=input
dst=c1

[softmax]
src=c1
dst=s
"""
    )
    net = Net(Mode.PREDICT)
    load_net(net, str(conf))
    sess = Session(net, 0).compile_net()
    w = tmp_path / "n.bcnnmodel"
    save_weights(
        net,
        {k: np.asarray(v) for k, v in sess.params.items()},
        {k: np.asarray(v) for k, v in sess.state.items()},
        str(w),
    )
    out = tmp_path / "n.tflite"
    assert main(["x", str(conf), str(w), str(out)]) == 0
    assert out.stat().st_size > 500
    interp = tf.lite.Interpreter(model_path=str(out))
    interp.allocate_tensors()  # valid flatbuffer


def test_tflite_export_matches_forward(tmp_path):
    from bcnn2tflite import convert_net

    from bcnn_tpu import (
        Activation, FillerType, Loss, Metric, Mode, Net, Session, Padding,
    )

    net = Net(Mode.PREDICT)
    net.set_input_shape(16, 16, 3, 1)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.LRELU, 0,
        "input", "c1",
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0, "p1", "c2"
    )
    net.add_eltwise_layer(Activation.NONE, "p1", "c2", "add1")
    net.add_fullc_layer(6, FillerType.XAVIER, Activation.NONE, 0, "add1", "f")
    net.add_softmax_layer("f", "s")
    sess = Session(net, 0).compile_net()
    # give BN running stats non-trivial values
    for k in sess.state:
        if "run_var" in k:
            sess.state[k] = np.abs(
                np.random.RandomState(0).randn(*np.asarray(sess.state[k]).shape)
            ).astype(np.float32) + 0.5

    out = str(tmp_path / "m.tflite")
    convert_net(net, sess.params, sess.state, out)

    x = np.random.RandomState(1).randn(1, 3, 16, 16).astype(np.float32)
    (want,), _ = sess.predict_on_batch(x, outputs=["s"])
    want = np.asarray(want).reshape(1, -1)

    interp = tf.lite.Interpreter(model_path=out)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(
        inp["index"], np.transpose(x, (0, 2, 3, 1)).astype(np.float32)
    )
    interp.invoke()
    got = interp.get_tensor(interp.get_output_details()[0]["index"])
    got = np.asarray(got).reshape(1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def _interp_run(blob, x_nchw):
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], np.transpose(x_nchw, (0, 2, 3, 1)))
    interp.invoke()
    return interp.get_tensor(out["index"])


def test_direct_writer_lenet_matches_forward():
    """The hand-written flatbuffer (tools/tflite_writer.py, no TF) must
    load in the TFLite interpreter and reproduce the framework forward."""
    import jax.numpy as jnp

    from bcnn2tflite import convert_net
    from bcnn_tpu import Mode, Session
    from bcnn_tpu.models import lenet_mnist

    net = lenet_mnist(batch_size=1, mode=Mode.PREDICT)
    sess = Session(net, 0).compile_net()
    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])
    blob = convert_net(net, sess.params, sess.state, None,
                       backend="direct")
    x = np.random.RandomState(0).randn(1, 1, 28, 28).astype(np.float32)
    got = _interp_run(blob, x).reshape(-1)
    (want,), _ = sess.predict_on_batch(x, outputs=["softmax"])
    np.testing.assert_allclose(
        got, np.asarray(want).reshape(-1), atol=1e-5
    )


def test_direct_writer_layer_zoo():
    """Depthwise, deconv, PReLU/LRELU/tanh/logistic, standalone BN,
    concat, eltwise, upsample, global avgpool through the direct writer."""
    import jax.numpy as jnp

    from bcnn2tflite import convert_net
    from bcnn_tpu import (
        Activation,
        FillerType,
        Mode,
        Net,
        Padding,
        Session,
    )

    X = FillerType.XAVIER
    net = Net(Mode.PREDICT)
    net.set_input_shape(16, 16, 3, 1)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, X, Activation.PRELU, 0, "input", "c1"
    )
    net.add_depthwise_conv_layer(
        3, 1, 1, 0, X, Activation.LRELU, "c1", "dw"
    )
    net.add_batchnorm_layer("dw", "bn")
    net.add_convolutional_layer(
        8, 1, 1, 0, 1, 0, X, Activation.TANH, 0, "bn", "c2"
    )
    net.add_eltwise_layer(Activation.NONE, "c1", "c2", "add")
    net.add_maxpool_layer(2, 2, Padding.SAME, "add", "mp")
    net.add_deconvolutional_layer(
        6, 2, 2, 0, X, Activation.LOGISTIC, "mp", "up"
    )
    net.add_upsample_layer(2, "up", "us")
    net.add_concat_layer(["us", "us"], "cat")
    net.add_avgpool_layer("cat", "gap")
    net.add_fullc_layer(5, X, Activation.NONE, 0, "gap", "fc")
    net.add_softmax_layer("fc", "sm")
    sess = Session(net, 0).compile_net()
    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])

    blob = convert_net(net, sess.params, sess.state, None,
                       backend="direct")
    x = np.random.RandomState(1).randn(1, 3, 16, 16).astype(np.float32)
    got = _interp_run(blob, x).reshape(-1)
    (want,), _ = sess.predict_on_batch(x, outputs=["sm"])
    np.testing.assert_allclose(
        got, np.asarray(want).reshape(-1), atol=1e-5
    )


def test_direct_writer_rejects_yolo_like_reference():
    from bcnn2tflite import convert_net
    from bcnn_tpu import Mode, Session
    from bcnn_tpu.models import yolov3_tiny

    net = yolov3_tiny(batch_size=1, width=64, height=64, classes=2,
                      mode=Mode.PREDICT)
    sess = Session(net, 0).compile_net()
    with pytest.raises(ValueError, match="not supported"):
        convert_net(net, sess.params, sess.state, None, backend="direct")
