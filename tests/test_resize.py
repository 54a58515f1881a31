"""bcnn_resize_net equivalent: reshape a fully-convolutional graph and
re-run (re-trace) at the new resolution."""

import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.graph import BuildError
from bcnn_tpu.models import yolov3_tiny, lenet_mnist


def test_resize_yolov3_tiny():
    net = yolov3_tiny(batch_size=1, width=416, height=416, classes=4)
    net.resize(320, 320)
    assert (net.tensors[0].w, net.tensors[0].h) == (320, 320)
    assert net.tensor("lid17").h == 10  # 320/32
    assert net.tensor("lid24").h == 20  # 320/16
    sess = Session(net, 0).compile_net()
    x = np.zeros((1, 3, 320, 320), np.float32)
    (out,), _ = sess.predict_on_batch(x, outputs=["lid17"])
    assert np.asarray(out).shape == (1, 3 * 9, 10, 10)


def test_resize_mobilenet_depthwise():
    from bcnn_tpu.models import mobilenet_v1

    net = mobilenet_v1(batch_size=1, classes=10, mode=Mode.PREDICT,
                       width_mult=0.25)
    net.resize(192, 192)
    # stem s2 -> 96, then depthwise strides 1,2,1,2,1,2,1*5,2,1 -> 6x6
    assert net.tensor("pw13").h == 6
    sess = Session(net, 0).compile_net()
    x = np.zeros((1, 3, 192, 192), np.float32)
    (out,), _ = sess.predict_on_batch(x, outputs=["softmax"])
    assert np.asarray(out).size == 10


def test_resize_rejects_fc_change():
    net = lenet_mnist(4)
    with pytest.raises(BuildError):
        net.resize(32, 32)


def test_log_summary_smoke(capsys):
    from bcnn_tpu.log import LogContext, print_net_summary

    lines = []
    ctx = LogContext(callback=lines.append)
    net = yolov3_tiny(batch_size=1, classes=4)
    print_net_summary(net, ctx)
    assert len(lines) == len(net.nodes) + 1
    assert "CONV2D" in lines[1]
