"""Round-trip and format tests for .bcnnmodel / Darknet .weights
(src/bcnn_net.c:595-681 save, :1222-1480 loaders)."""

import struct

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
from bcnn_tpu.serialization import (
    BCNN_MAGIC,
    load_weights,
    model_find_format,
    save_weights,
)


def small_net(mode=Mode.TRAIN):
    net = Net(mode)
    net.set_input_shape(8, 8, 3, 2)
    if mode != Mode.PREDICT:
        net.set_sgd_optimizer(0.01, 0.9)
    net.add_convolutional_layer(
        4, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0, "input", "c1"
    )
    net.add_batchnorm_layer("c1", "bn1")
    net.add_fullc_layer(5, FillerType.MSRA, Activation.NONE, 0, "bn1", "f1")
    net.add_activation_layer(Activation.PRELU, "f1")
    return net


def randomize(params, state, seed=0):
    rng = np.random.RandomState(seed)
    for d in (params, state):
        for k in d:
            d[k] = rng.randn(*np.asarray(d[k]).shape).astype(np.float32)


def test_format_detection():
    assert model_find_format("a.bcnnmodel") == 0
    assert model_find_format("yolov3-tiny.weights") == 1
    assert model_find_format("m.onnx") == 2


def test_bcnn_roundtrip(tmp_path):
    net = small_net()
    sess = Session(net, 0).compile_net()
    randomize(sess.params, sess.state, 3)
    p = {k: np.asarray(v) for k, v in sess.params.items()}
    s = {k: np.asarray(v) for k, v in sess.state.items()}
    f = str(tmp_path / "m.bcnnmodel")
    save_weights(net, p, s, f)

    with open(f, "rb") as fp:
        assert fp.read(4) == BCNN_MAGIC
        struct.unpack("<3I", fp.read(12))
    # expected payload: conv(b4 + w4*3*3*3 + m4+v4+s4) + bn(4*4)
    #                   + fc(b5 + w5*256) + prelu(5)
    expected_floats = (4 + 108 + 12) + 16 + (5 + 5 * 256) + 5
    import os

    assert os.path.getsize(f) == 16 + 4 * expected_floats

    net2 = small_net()
    sess2 = Session(net2, 1).compile_net()
    load_weights(net2, sess2.params, sess2.state, f)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(sess2.params[k]).ravel(), p[k].ravel(), rtol=1e-6
        )
    for k in s:
        np.testing.assert_allclose(
            np.asarray(sess2.state[k]).ravel(), s[k].ravel(), rtol=1e-6
        )


def test_conv_weight_blob_order():
    """Blob must be (O, I, k, k) flat like the reference's NCHW buffers."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(4, 4, 2, 1)
    net.set_sgd_optimizer(0.01, 0.9)
    net.add_convolutional_layer(
        3, 2, 1, 0, 1, 0, FillerType.XAVIER, Activation.NONE, 0, "input", "c"
    )
    from bcnn_tpu.serialization import _w_blob_to_mem, _w_mem_to_blob

    node = net.nodes[0]
    blob = np.arange(3 * 2 * 2 * 2, dtype=np.float32)  # (O=3,I=2,k,k)
    mem = _w_blob_to_mem(net, node, blob)
    assert mem.shape == (2, 2, 2, 3)  # HWIO
    # element (o=1, i=0, kh=1, kw=0) = index 1*8 + 0*4 + 1*2 + 0 = 10
    assert mem[1, 0, 0, 1] == 10.0
    np.testing.assert_array_equal(_w_mem_to_blob(net, node, mem), blob)


def test_darknet_load_order(tmp_path):
    """Darknet: header 3xi32 + seen(u64 for v2), conv order
    bias, [scales, mean, var], weights (bcnn_net.c:1232-1307)."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(4, 4, 1, 1)
    net.set_sgd_optimizer(0.01, 0.9)
    net.add_convolutional_layer(
        2, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.LRELU, 0, "input", "c"
    )
    f = str(tmp_path / "m.weights")
    bias = np.array([1, 2], np.float32)
    scales = np.array([3, 4], np.float32)
    mean = np.array([5, 6], np.float32)
    var = np.array([7, 8], np.float32)
    w = np.arange(2 * 1 * 3 * 3, dtype=np.float32)
    with open(f, "wb") as fp:
        fp.write(struct.pack("<3i", 0, 2, 0))
        fp.write(struct.pack("<Q", 12345))
        for a in (bias, scales, mean, var, w):
            a.tofile(fp)
    sess = Session(net, 0).compile_net()
    load_weights(net, sess.params, sess.state, f)
    got_b = np.asarray(sess.params[net.tensors[net.nodes[0].src[2]].key])
    got_s = np.asarray(sess.params[net.tensors[net.nodes[0].src[5]].key])
    got_m = np.asarray(sess.state[net.tensors[net.nodes[0].src[3]].key])
    np.testing.assert_array_equal(got_b, bias)
    np.testing.assert_array_equal(got_s, scales)
    np.testing.assert_array_equal(got_m, mean)


def test_darknet_writer_roundtrip(tmp_path):
    """save_weights_darknet (interop extension — the reference only LOADS
    this format) round-trips through our format-1 loader. Standalone-BN
    biases and standalone-PReLU slopes are NOT part of the format
    (bcnn_net.c:1381-1392, :1543) and stay at the fresh net's values."""
    from bcnn_tpu.serialization import save_weights_darknet

    net = small_net()
    sess = Session(net, 0).compile_net()
    randomize(sess.params, sess.state, 5)
    p = {k: np.asarray(v) for k, v in sess.params.items()}
    s = {k: np.asarray(v) for k, v in sess.state.items()}
    f = str(tmp_path / "m.weights")
    save_weights_darknet(net, p, s, f, seen=777)

    with open(f, "rb") as fp:
        assert struct.unpack("<3i", fp.read(12)) == (0, 2, 0)
        assert struct.unpack("<Q", fp.read(8)) == (777,)
    # payload: conv(b4 + s4+m4+v4 + w108) + bn(s4+m4+v4) + fc(b5 + w1280);
    # no bn biases, no standalone prelu slopes
    expected_floats = (4 + 12 + 108) + 12 + (5 + 5 * 256)
    import os

    assert os.path.getsize(f) == 20 + 4 * expected_floats

    net2 = small_net()
    sess2 = Session(net2, 1).compile_net()
    load_weights(net2, sess2.params, sess2.state, f)
    bn_bias_key = net.tensors[net.nodes[1].src[4]].key
    prelu_key = net.tensors[net.nodes[3].src[1]].key
    for k in p:
        if k in (bn_bias_key, prelu_key):
            continue
        np.testing.assert_allclose(
            np.asarray(sess2.params[k]).ravel(), p[k].ravel(), rtol=1e-6,
            err_msg=k,
        )
    for k in s:
        np.testing.assert_allclose(
            np.asarray(sess2.state[k]).ravel(), s[k].ravel(), rtol=1e-6,
            err_msg=k,
        )
    # not-in-format tensors keep the fresh net's initial values
    np.testing.assert_array_equal(
        np.asarray(sess2.params[bn_bias_key]),
        np.zeros_like(p[bn_bias_key]),
    )


def test_bn_fold_at_predict_load(tmp_path):
    """Loading in PREDICT folds mean/var into scales/bias
    (bcnn_net.c:1281-1292) and PREDICT forward then matches VALID forward
    of the unfolded net."""
    net = small_net(Mode.TRAIN)
    sess = Session(net, 0).compile_net()
    randomize(sess.params, sess.state, 7)
    # variances must be positive
    for k in sess.state:
        if "run_var" in k:
            sess.state[k] = np.abs(np.asarray(sess.state[k])) + 0.5
    p = {k: np.asarray(v) for k, v in sess.params.items()}
    s = {k: np.asarray(v) for k, v in sess.state.items()}
    f = str(tmp_path / "m.bcnnmodel")
    save_weights(net, p, s, f)

    x = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
    net.set_mode(Mode.VALID)
    (ref_out,), _ = sess.predict_on_batch(x, outputs=["f1"])

    net2 = small_net(Mode.PREDICT)
    sess2 = Session(net2, 1).compile_net()
    load_weights(net2, sess2.params, sess2.state, f)
    assert net2.bn_folded
    sess2.params = {k: np.asarray(v) for k, v in sess2.params.items()}
    (out2,), _ = sess2.predict_on_batch(x, outputs=["f1"])
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref_out), rtol=2e-4, atol=2e-5
    )
