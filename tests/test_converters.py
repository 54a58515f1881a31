"""Converter tests: caffe2bcnn round-trip through a synthetic caffemodel
built with the same public-schema subset, loaded back by the framework."""

import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


def _pb():
    from caffe2bcnn import _load_proto_module

    return _load_proto_module()


def make_caffe_model(tmp_path):
    pb = _pb()
    rng = np.random.RandomState(0)

    prototxt = tmp_path / "net.prototxt"
    prototxt.write_text(
        """
name: "tiny"
layer { name: "data" type: "Input" top: "data"
        input_param { shape { dim: 1 dim: 3 dim: 8 dim: 8 } } }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
        convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 1 } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
        pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "fc1" type: "InnerProduct" bottom: "pool1" top: "fc1"
        inner_product_param { num_output: 5 } }
layer { name: "prob" type: "Softmax" bottom: "fc1" top: "prob" }
"""
    )

    model = pb.NetParameter()
    conv = model.layer.add()
    conv.name = "conv1"
    conv.type = "Convolution"
    w = conv.blobs.add()
    conv_w = rng.randn(4 * 3 * 3 * 3).astype(np.float32)
    w.data.extend(conv_w.tolist())
    b = conv.blobs.add()
    conv_b = rng.randn(4).astype(np.float32)
    b.data.extend(conv_b.tolist())
    fc = model.layer.add()
    fc.name = "fc1"
    fc.type = "InnerProduct"
    fw = fc.blobs.add()
    fc_w = rng.randn(5 * 4 * 4 * 4).astype(np.float32)
    fw.data.extend(fc_w.tolist())
    fb = fc.blobs.add()
    fc_b = rng.randn(5).astype(np.float32)
    fb.data.extend(fc_b.tolist())
    caffemodel = tmp_path / "net.caffemodel"
    caffemodel.write_bytes(model.SerializeToString())
    return str(prototxt), str(caffemodel), conv_w, conv_b, fc_w, fc_b


def test_caffe2bcnn_roundtrip(tmp_path):
    from caffe2bcnn import convert

    prototxt, caffemodel, conv_w, conv_b, fc_w, fc_b = make_caffe_model(
        tmp_path
    )
    out_conf = str(tmp_path / "net.conf")
    out_model = str(tmp_path / "net.bcnnmodel")
    convert(prototxt, caffemodel, out_conf, out_model)

    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net

    net = Net(Mode.PREDICT)
    load_net(net, out_conf, out_model)
    sess = Session(net, 0).compile_net()
    # loaded conv weights must equal the caffe blob (same OIHW blob order)
    w_key = [t.key for t in net.param_specs() if t.name == "data_w"][0]
    got = np.asarray(sess.params[w_key])  # HWIO
    want = conv_w.reshape(4, 3, 3, 3).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    b_key = [t.key for t in net.param_specs() if t.name == "data_b"][0]
    np.testing.assert_allclose(np.asarray(sess.params[b_key]), conv_b)
    # and the graph runs
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    (probs,), _ = sess.predict_on_batch(x, outputs=["prob"])
    np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, rtol=1e-4)


def test_caffe2bcnn_batchnorm_fold(tmp_path):
    pb = _pb()
    prototxt = tmp_path / "bn.prototxt"
    prototxt.write_text(
        """
layer { name: "data" type: "Input" top: "data"
        input_param { shape { dim: 1 dim: 2 dim: 4 dim: 4 } } }
layer { name: "bn" type: "BatchNorm" bottom: "data" top: "bn"
        batch_norm_param { eps: 0.001 } }
"""
    )
    model = pb.NetParameter()
    bn = model.layer.add()
    bn.name = "bn"
    bn.type = "BatchNorm"
    mean = bn.blobs.add()
    mean.data.extend([1.0, 2.0])
    var = bn.blobs.add()
    var.data.extend([4.0, 9.0])
    sf = bn.blobs.add()
    sf.data.extend([2.0])  # scale factor -> mean/2, var/2
    (tmp_path / "bn.caffemodel").write_bytes(model.SerializeToString())

    from caffe2bcnn import convert

    convert(
        str(prototxt),
        str(tmp_path / "bn.caffemodel"),
        str(tmp_path / "bn.conf"),
        str(tmp_path / "bn.bcnnmodel"),
    )
    blob = np.fromfile(str(tmp_path / "bn.bcnnmodel"), np.float32, offset=16)
    np.testing.assert_allclose(blob[:2], [0.5, 1.0])  # mean * 1/sf
    np.testing.assert_allclose(blob[2:4], [2.001, 4.501])  # var*1/sf + eps
    np.testing.assert_allclose(blob[4:6], [1.0, 1.0])  # scales
    np.testing.assert_allclose(blob[6:8], [0.0, 0.0])  # biases
