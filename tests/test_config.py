"""Config parsing tests: both dialects, grammar quirks, reference configs."""

import os

import numpy as np
import pytest

from bcnn_tpu import LrDecay, Metric, Mode, Net, Optimizer
from bcnn_tpu.config import load_net, parse_ini
from bcnn_tpu.types import Activation, LayerType

MNIST_CONF = """
# comment
[network]
input_width=28
input_height=28
input_channels=1
batch_size=16
optimizer=sgd
momentum=0.9
decay=0.0005
learning_rate=0.003
decay_type=sigmoid
gamma=.00002
step=400000
unknown_cli_key=ignored

[convolutional]
filters=16
size=3
stride=1
pad=1
init=xavier
src=input
dst=conv1

[activation]
function=relu
src=conv1

[maxpool]
size=2
stride=2
src=conv1
dst=pool1

[connected]
output=10
init=xavier
src=pool1
dst=fc1

[softmax]
src=fc1
dst=soft

[cost]
src=soft
dst=out
loss=euclidean
metric=error
"""


def test_whitespace_stripped_like_bh_strstrip(tmp_path):
    f = tmp_path / "w.conf"
    f.write_text("[net]\n  batch _ size = 8\nanchors = 1, 2,  3\n")
    secs = parse_ini(str(f))
    # ALL whitespace removed: "batch_size=8"
    assert secs[0].keys[0] == ("batch_size", "8")
    assert secs[0].keys[1] == ("anchors", "1,2,3")


def test_bcnn_dialect_mnist(tmp_path):
    f = tmp_path / "mnist.conf"
    f.write_text(MNIST_CONF)
    net = Net(Mode.TRAIN)
    load_net(net, str(f))
    assert net.batch_size == 16
    assert net.tensors[0].shape == (16, 1, 28, 28)
    ln = net.learner
    assert ln.optimizer == Optimizer.SGD
    assert ln.decay_type == LrDecay.SIGMOID
    np.testing.assert_allclose(ln.gamma, 2e-5)
    assert ln.step == 400000
    types = [n.type for n in net.nodes]
    assert types == [
        LayerType.CONV2D,
        LayerType.ACTIVATION,
        LayerType.MAXPOOL,
        LayerType.FULL_CONNECTED,
        LayerType.SOFTMAX,
        LayerType.COST,
    ]
    # pool1 shape 14x14, fc 10, cost metric error
    assert net.tensor("pool1").h == 14
    assert net.nodes[-1].param["loss_metric"] == Metric.ERROR_RATE
    # activation was in-place on conv1; maxpool reads post-relu conv1
    assert net.nodes[1].src[0] == net.nodes[1].dst[0]


DARKNET_CFG = """
[net]
batch=1
width=32
height=32
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[route]
layers=-2

[shortcut]
from=-2
activation=linear
"""


def test_darknet_dialect(tmp_path):
    f = tmp_path / "d.cfg"
    f.write_text(DARKNET_CFG)
    w = tmp_path / "fake.weights"  # presence of .weights selects dialect
    net = Net(Mode.PREDICT)
    # don't actually load weights: pass model_path=None but force fmt by
    # writing explicit src/dst?  No — reference infers dialect from model
    # file; emulate by loading with a real (tiny, valid) weights file.
    import struct

    with open(w, "wb") as fp:
        fp.write(struct.pack("<3i", 0, 2, 0))
        fp.write(struct.pack("<Q", 0))
        # conv1: bias8, scales8, mean8, var8, w 8*3*3*3
        np.zeros(8, np.float32).tofile(fp)
        np.ones(8, np.float32).tofile(fp)
        np.zeros(8, np.float32).tofile(fp)
        np.ones(8, np.float32).tofile(fp)
        np.zeros(8 * 3 * 3 * 3, np.float32).tofile(fp)
        # conv2: bias16, scales16, mean16, var16, w 16*8*3*3
        np.zeros(16, np.float32).tofile(fp)
        np.ones(16, np.float32).tofile(fp)
        np.zeros(16, np.float32).tofile(fp)
        np.ones(16, np.float32).tofile(fp)
        np.zeros(16 * 8 * 3 * 3, np.float32).tofile(fp)
    load_net(net, str(f), str(w))
    # implicit darknet names: conv1 -> lid1, maxpool -> lid2, conv2 -> lid3,
    # route(layers=-2) -> src lid{4-2}=lid2, shortcut(from=-2) ->
    # srcs lid4 (prev) and lid{5-2}=lid3
    types = [n.type for n in net.nodes]
    assert types == [
        LayerType.CONV2D,
        LayerType.MAXPOOL,
        LayerType.CONV2D,
        LayerType.CONCAT,
        LayerType.ELTWISE,
    ]
    route = net.nodes[3]
    assert net.tensors[route.src[0]].name == "lid2"
    shortcut = net.nodes[4]
    assert net.tensors[shortcut.src[0]].name == "lid4"
    assert net.tensors[shortcut.src[1]].name == "lid3"
    # darknet pad=1 with size=3 -> pad k/2 = 1
    assert net.nodes[0].param["pad"] == 1
    assert net.nodes[0].param["activation"] == Activation.LRELU
    assert net.bn_folded  # PREDICT load folds BN


REFERENCE_CONF = "/root/reference/examples/mnist_cl/mnist.conf"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CONF), reason="reference not mounted"
)
def test_reference_mnist_conf_parses():
    net = Net(Mode.TRAIN)
    load_net(net, REFERENCE_CONF)
    assert net.batch_size == 16
    assert len(net.nodes) == 12
    assert net.tensor("soft").shape == (16, 10, 1, 1)


REFERENCE_YOLO_CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "yolo", "yolov3-tiny.cfg",
)


def test_reference_yolov3_tiny_cfg_parses(tmp_path):
    """Parse the Darknet yolov3-tiny graph (no weights file -> use a dummy
    .weights name trick is not possible; instead parse with fmt forced by
    a stub file)."""
    import struct

    # build the full expected weights layout is complex; instead parse the
    # graph only by creating a net and calling the internal pieces with
    # fmt=1 directly.
    from bcnn_tpu.config import LayerParam, add_layer, layer_param_set, \
        net_set_param, parse_ini

    net = Net(Mode.PREDICT)
    sections = parse_ini(REFERENCE_YOLO_CFG)
    for k, v in sections[0].keys:
        net_set_param(net, k, v)
    for i in range(1, len(sections)):
        lp = LayerParam()
        for k, v in sections[i].keys:
            layer_param_set(lp, i, k, v, fmt=1)
        if lp.src_id is None:
            lp.src_id = [f"lid{i-1}"]
        if lp.dst_id is None:
            lp.dst_id = f"lid{i}"
        add_layer(net, sections[i].name, lp)
    types = [n.type for n in net.nodes]
    assert types.count(LayerType.YOLOV3) == 2
    assert types.count(LayerType.CONV2D) == 13
    assert types.count(LayerType.MAXPOOL) == 6
    assert types.count(LayerType.UPSAMPLE) == 1
    assert types.count(LayerType.CONCAT) == 2  # [route] x2
    # grid sizes: 416/32=13 and 416/16=26
    yolo_nodes = [n for n in net.nodes if n.type == LayerType.YOLOV3]
    shapes = sorted(net.tensors[n.dst[0]].h for n in yolo_nodes)
    assert shapes == [13, 26]
    # anchors parsed
    assert len(yolo_nodes[0].param["anchors"]) == 12
    assert yolo_nodes[0].param["classes"] == 80

    _run_yolo_forward(net, yolo_nodes)


def _parse_darknet(path):
    from bcnn_tpu.config import LayerParam, add_layer, layer_param_set, \
        net_set_param, parse_ini

    net = Net(Mode.PREDICT)
    sections = parse_ini(path)
    for k, v in sections[0].keys:
        net_set_param(net, k, v)
    for i in range(1, len(sections)):
        lp = LayerParam()
        for k, v in sections[i].keys:
            layer_param_set(lp, i, k, v, fmt=1)
        if lp.src_id is None:
            lp.src_id = [f"lid{i-1}"]
        if lp.dst_id is None:
            lp.dst_id = f"lid{i}"
        add_layer(net, sections[i].name, lp)
    return net


def _run_yolo_forward(net, yolo_nodes, size=160):
    # the full reference graph must run: resize down for CPU speed and
    # execute one forward through all heads
    import numpy as np

    from bcnn_tpu import Session

    net.resize(size, size, batch_size=1)
    sess = Session(net, 0).compile_net()
    names = [net.tensors[n.dst[0]].name for n in yolo_nodes]
    x = np.zeros((1, 3, size, size), np.float32)
    outs, _ = sess.predict_on_batch(x, outputs=names)
    got = sorted(np.asarray(o).shape[2] for o in outs)
    assert got == sorted(size // (32 // 2**i) for i in range(len(names)))
    for o in outs:
        a = np.asarray(o)
        assert np.isfinite(a).all()


def test_reference_yolov3_full_cfg_parses():
    """The vendored full yolov3.cfg (789 lines): 75 convs, 23 [shortcut]
    (eltwise), 3 heads at strides 32/16/8."""
    cfg = REFERENCE_YOLO_CFG.replace("yolov3-tiny.cfg", "yolov3.cfg")
    net = _parse_darknet(cfg)
    types = [n.type for n in net.nodes]
    assert types.count(LayerType.YOLOV3) == 3
    assert types.count(LayerType.CONV2D) == 75
    assert types.count(LayerType.ELTWISE) == 23
    assert types.count(LayerType.UPSAMPLE) == 2
    # all 4 [route]s become concat nodes (1-src route == copy, like the
    # reference's bcnn_add_concat_layer with a single source)
    assert types.count(LayerType.CONCAT) == 4
    yolo_nodes = [n for n in net.nodes if n.type == LayerType.YOLOV3]
    shapes = sorted(net.tensors[n.dst[0]].h for n in yolo_nodes)
    assert shapes == [19, 38, 76]  # yolov3.cfg is 608x608
    _run_yolo_forward(net, yolo_nodes, size=128)


def test_yolov3_full_builder():
    """models.yolov3 (vendored-cfg-backed builder): classes rewrite
    propagates to the head convs, and a small-size forward runs all
    three heads."""
    from bcnn_tpu.models import yolov3

    net = yolov3(batch_size=1, width=128, height=128, classes=4)
    types = [n.type for n in net.nodes]
    assert types.count(LayerType.YOLOV3) == 3
    assert types.count(LayerType.CONV2D) == 75
    yolo_nodes = [n for n in net.nodes if n.type == LayerType.YOLOV3]
    for n in yolo_nodes:
        assert n.param["classes"] == 4
        assert net.tensors[n.src[0]].c == 3 * (4 + 5)
    assert sorted(net.tensors[n.dst[0]].h for n in yolo_nodes) == [4, 8, 16]
    _run_yolo_forward(net, yolo_nodes, size=128)
