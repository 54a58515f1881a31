"""bcnn2tflite: export a bcnn net (+weights) to a TFLite flatbuffer.

Port of tools/tflite_converter/bcnn2tflite.cc: the op mapping
(bcnn2tflite.cc:203-218) is preserved —
  CONV2D -> CONV_2D, TRANSPOSE_CONV2D -> TRANSPOSE_CONV,
  DEPTHWISE_CONV2D -> DEPTHWISE_CONV_2D, FULL_CONNECTED -> FULLY_CONNECTED
  (with the injected flatten/reshape, :52-80), MAXPOOL -> MAX_POOL_2D,
  AVGPOOL -> MEAN (global), SOFTMAX -> SOFTMAX, CONCAT -> CONCATENATION,
  UPSAMPLE -> RESIZE_NEAREST_NEIGHBOR, ELTWISE -> ADD, activations
  RELU / LOGISTIC / PRELU / LEAKY_RELU / TANH; BatchNorm folds into a
  MUL/ADD pair (inference export). NCHW<->NHWC weight handling is done by
  the framework's own layouts.

Two backends:
  - TensorFlow (default when importable): graph rebuilt as a tf.function
    and serialized through tf.lite.TFLiteConverter — gains TF's own
    validation and op coverage (incl. the YOLO activated head).
  - Direct flatbuffer (tools/tflite_writer.py, like the reference's
    vendored-flatbuffers writer): no TF dependency, survives TF API
    drift. Used automatically when TF is absent, or forced with
    --direct. Interpreter-validated in tests when TF is present.

Usage: python tools/bcnn2tflite.py <conf> <weights> <out.tflite> [--direct]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_tf_forward(net, params, state):
    """Returns a tf.function(x_nhwc) reproducing the net's PREDICT forward."""
    import tensorflow as tf

    from bcnn_tpu.types import Activation, LayerType, Mode
    from bcnn_tpu.ops.norm import EPS

    def act_fn(a, slopes=None):
        def apply(y):
            if a == Activation.NONE:
                return y
            if a == Activation.RELU:
                return tf.nn.relu(y)
            if a == Activation.LRELU:
                return tf.nn.leaky_relu(y, alpha=0.1)
            if a == Activation.LOGISTIC:
                return tf.sigmoid(y)
            if a == Activation.TANH:
                return tf.tanh(y)
            if a == Activation.PRELU:
                s = tf.constant(np.asarray(slopes, np.float32))
                return tf.where(y > 0, y, s * y)
            if a == Activation.CLAMP:
                return tf.clip_by_value(y, 0.0, 1.0)
            raise ValueError(f"activation {a} not supported by tflite export")

        return apply

    def p(idx):
        return np.asarray(params[net.tensors[idx].key], np.float32)

    def s(idx):
        return np.asarray(state[net.tensors[idx].key], np.float32)

    def forward(x):
        values = {0: x}
        for node in net.nodes:
            t = node.type
            if t == LayerType.CONV2D:
                prm = node.param
                xin = values[node.src[0]]
                w = tf.constant(p(node.src[1]))
                pad = prm["pad"]
                if pad:
                    xin = tf.pad(
                        xin, [[0, 0], [pad, pad], [pad, pad], [0, 0]]
                    )
                y = tf.nn.conv2d(
                    xin, w, strides=prm["stride"], padding="VALID"
                )
                if prm.get("batch_norm"):
                    scales = p(node.src[5])
                    bias = p(node.src[2])
                    if not net.bn_folded:
                        mean, var = s(node.src[3]), s(node.src[4])
                        denom = np.sqrt(var + EPS)
                        bias = bias - scales * mean / denom
                        scales = scales / denom
                    y = y * scales + bias
                else:
                    y = y + p(node.src[2])
                slopes = (
                    p(node.src[6 if prm.get("batch_norm") else 3])
                    if prm["activation"] == Activation.PRELU
                    else None
                )
                y = act_fn(prm["activation"], slopes)(y)
            elif t == LayerType.DEPTHWISE_CONV2D:
                prm = node.param
                xin = values[node.src[0]]
                w = p(node.src[1])  # (k,k,1,C) -> tf wants (k,k,C,1)
                w = tf.constant(np.transpose(w, (0, 1, 3, 2)))
                pad = prm["pad"]
                if pad:
                    xin = tf.pad(
                        xin, [[0, 0], [pad, pad], [pad, pad], [0, 0]]
                    )
                y = tf.nn.depthwise_conv2d(
                    xin, w,
                    strides=[1, prm["stride"], prm["stride"], 1],
                    padding="VALID",
                )
                y = y + p(node.src[2])
                y = act_fn(prm["activation"])(y)
            elif t == LayerType.TRANSPOSE_CONV2D:
                prm = node.param
                xin = values[node.src[0]]
                d = net.tensors[node.dst[0]]
                # mem (k,k,I=out,O=in); tf.conv2d_transpose wants
                # (k,k,out,in)
                w = tf.constant(p(node.src[1]))
                y = tf.nn.conv2d_transpose(
                    xin, w,
                    output_shape=[tf.shape(xin)[0], d.h, d.w, d.c],
                    strides=prm["stride"],
                    padding="VALID" if prm["pad"] == 0 else "SAME",
                )
                y = y + p(node.src[2])
                y = act_fn(prm["activation"])(y)
            elif t == LayerType.FULL_CONNECTED:
                prm = node.param
                xin = values[node.src[0]]
                if len(xin.shape) == 4:
                    # NCHW flatten order (the injected reshape,
                    # bcnn2tflite.cc:52-80)
                    xin = tf.transpose(xin, (0, 3, 1, 2))
                xin = tf.reshape(xin, (tf.shape(xin)[0], -1))
                y = tf.matmul(xin, tf.constant(p(node.src[1]))) + p(
                    node.src[2]
                )
                y = act_fn(prm["activation"])(y)
                y = tf.reshape(y, (-1, 1, 1, y.shape[-1]))
            elif t == LayerType.MAXPOOL:
                prm = node.param
                d = net.tensors[node.dst[0]]
                xin = values[node.src[0]]
                sh = xin.shape
                k_, st = prm["size"], prm["stride"]
                ph = max(0, (d.h - 1) * st + k_ - int(sh[1]))
                pw = max(0, (d.w - 1) * st + k_ - int(sh[2]))
                if ph or pw:
                    xin = tf.pad(
                        xin, [[0, 0], [0, ph], [0, pw], [0, 0]],
                        constant_values=-3.4e38,
                    )
                y = tf.nn.max_pool2d(xin, k_, st, padding="VALID")
            elif t == LayerType.AVGPOOL:
                y = tf.reduce_mean(
                    values[node.src[0]], axis=[1, 2], keepdims=True
                )
            elif t == LayerType.SOFTMAX:
                y = tf.nn.softmax(values[node.src[0]], axis=-1)
            elif t == LayerType.DROPOUT:
                y = values[node.src[0]]
            elif t == LayerType.ACTIVATION:
                prm = node.param
                slopes = (
                    p(node.src[1])
                    if prm["activation"] == Activation.PRELU
                    else None
                )
                y = act_fn(prm["activation"], slopes)(values[node.src[0]])
            elif t == LayerType.BATCHNORM:
                xin = values[node.src[0]]
                scales, bias = p(node.src[3]), p(node.src[4])
                if not net.bn_folded:
                    mean, var = s(node.src[1]), s(node.src[2])
                    denom = np.sqrt(var + EPS)
                    bias = bias - scales * mean / denom
                    scales = scales / denom
                y = xin * scales + bias
            elif t == LayerType.CONCAT:
                y = tf.concat([values[i] for i in node.src], axis=-1)
            elif t == LayerType.ELTWISE:
                prm = node.param
                y = values[node.src[0]] + values[node.src[1]]
                y = act_fn(prm["activation"])(y)
            elif t == LayerType.UPSAMPLE:
                xin = values[node.src[0]]
                sz = node.param["size"]
                y = tf.image.resize(
                    xin,
                    [int(xin.shape[1]) * sz, int(xin.shape[2]) * sz],
                    method="nearest",
                )
            elif t == LayerType.COST:
                continue
            elif t == LayerType.YOLOV3:
                # activated head (logistic slices)
                from bcnn_tpu.ops.yolo import yolo_head  # shape math only

                prm = node.param
                xin = values[node.src[0]]
                num, classes = prm["num"], prm["classes"]
                e = 5 + classes
                shp = xin.shape
                xr = tf.reshape(
                    xin, (-1, int(shp[1]), int(shp[2]), num, e)
                )
                y = tf.concat(
                    [
                        tf.sigmoid(xr[..., 0:2]),
                        xr[..., 2:4],
                        tf.sigmoid(xr[..., 4:]),
                    ],
                    axis=-1,
                )
                y = tf.reshape(y, (-1, int(shp[1]), int(shp[2]), num * e))
            else:
                raise ValueError(f"layer {t} not supported by tflite export")
            values[node.dst[0]] = y
        # output: last non-cost node's tensor
        for node in reversed(net.nodes):
            if node.type != LayerType.COST:
                return values[node.dst[0]]

    return forward


def convert_net(net, params, state, out_path: str,
                backend: str = "auto") -> bytes:
    """backend: 'auto' (TF when importable, else direct), 'tf', 'direct'."""
    if backend == "auto":
        try:
            import tensorflow  # noqa: F401

            backend = "tf"
        except ImportError:
            backend = "direct"
    if backend == "direct":
        from tflite_writer import write_tflite

        return write_tflite(net, params, state, out_path)

    import tensorflow as tf

    t0 = net.tensors[0]
    forward = build_tf_forward(net, params, state)
    fn = tf.function(
        forward,
        input_signature=[
            tf.TensorSpec([1, t0.h, t0.w, t0.c], tf.float32)
        ],
    )
    conc = fn.get_concrete_function()
    converter = tf.lite.TFLiteConverter.from_concrete_functions([conc])
    tflite_model = converter.convert()
    with open(out_path, "wb") as f:
        f.write(tflite_model)
    return tflite_model


def main(argv):
    args = [a for a in argv if a != "--direct"]
    backend = "direct" if "--direct" in argv else "auto"
    if len(args) < 4:
        print(
            "Usage: bcnn2tflite.py <conf> <weights> <out.tflite> "
            "[--direct]"
        )
        return 1
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net

    net = Net(Mode.PREDICT)
    load_net(net, args[1], args[2])
    sess = Session(net, 0).compile_net()
    convert_net(net, sess.params, sess.state, args[3], backend=backend)
    print(f"wrote {args[3]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
