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
