"""AOT serving export (bcnn_tpu/deploy.py): jax.export StableHLO
artifacts with weights baked in — the TPU-native deployment target
alongside the TFLite converter (reference: tools/tflite_converter/)."""

import numpy as np
import pytest

from bcnn_tpu import (
    Activation,
    FillerType,
    Mode,
    Net,
    Padding,
    Session,
)
from bcnn_tpu.deploy import export_forward, load_exported


def classif_net(mode=Mode.PREDICT, batch=4):
    net = Net(mode)
    net.set_input_shape(16, 16, 3, batch)
    if mode != Mode.PREDICT:
        net.set_sgd_optimizer(0.01, 0.9)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.LRELU, 0,
        "input", "c1",
    )
    net.add_batchnorm_layer("c1", "b1")
    net.add_maxpool_layer(2, 2, Padding.SAME, "b1", "p1")
    net.add_fullc_layer(5, FillerType.MSRA, Activation.NONE, 0, "p1", "f")
    net.add_softmax_layer("f", "s")
    return net


def detect_net(batch=2):
    net = Net(Mode.PREDICT)
    net.set_input_shape(64, 64, 3, batch)
    net.add_convolutional_layer(
        8, 3, 2, 1, 1, 1, FillerType.XAVIER, Activation.LRELU, 0,
        "input", "c1",
    )
    net.add_convolutional_layer(
        21, 1, 1, 0, 1, 0, FillerType.XAVIER, Activation.NONE, 0,
        "c1", "head",
    )
    net.add_yolo_layer(
        3, 2, 4, 6, [3, 4, 5],
        [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319],
        "head", "out",
    )
    return net


def test_forward_export_matches_live(tmp_path):
    net = classif_net()
    sess = Session(net, 0).compile_net()
    rng = np.random.RandomState(0)
    for k in sess.params:
        a = np.asarray(sess.params[k])
        sess.params[k] = rng.randn(*a.shape).astype(np.float32) * 0.2
    for k in sess.state:
        a = np.asarray(sess.state[k])
        sess.state[k] = (
            (np.abs(rng.randn(*a.shape)) + 0.5)
            if "run_var" in k
            else rng.randn(*a.shape) * 0.1
        ).astype(np.float32)

    x = rng.randn(4, 3, 16, 16).astype(np.float32)
    (live,), _ = sess.predict_on_batch(x, outputs=["s"])

    path = str(tmp_path / "model.stablehlo")
    blob = sess.export_serving(path, outputs=["s"])
    assert len(blob) > 1000
    import os

    assert os.path.getsize(path) == len(blob)

    served = load_exported(path)
    (got,) = served(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(live), rtol=1e-6, atol=1e-7
    )

    # weights are BAKED IN: mutating the session must not affect the
    # artifact
    for k in sess.params:
        sess.params[k] = np.zeros_like(np.asarray(sess.params[k]))
    (got2,) = served(x)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_forward_export_default_output(tmp_path):
    net = classif_net()
    sess = Session(net, 0).compile_net()
    blob = export_forward(net, sess.params, sess.state)
    served = load_exported(blob)
    x = np.random.RandomState(1).randn(4, 3, 16, 16).astype(np.float32)
    (got,) = served(x)
    assert np.asarray(got).shape == (4, 5, 1, 1)
    assert "cpu" in served.platforms


def test_detect_export_matches_live(tmp_path):
    net = detect_net()
    sess = Session(net, 0).compile_net()
    rng = np.random.RandomState(2)
    for k in sess.params:
        a = np.asarray(sess.params[k])
        sess.params[k] = rng.randn(*a.shape).astype(np.float32) * 0.3
    for k in sess.state:
        a = np.asarray(sess.state[k])
        sess.state[k] = (
            (np.abs(rng.randn(*a.shape)) + 0.5)
            if "run_var" in k
            else rng.randn(*a.shape) * 0.1
        ).astype(np.float32)

    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    live_boxes, live_scores, live_obj = sess.detect_on_batch(
        x, thresh=0.4, max_dets=16
    )

    path = str(tmp_path / "detect.stablehlo")
    sess.export_serving(path, detect=True, thresh=0.4, max_dets=16)
    served = load_exported(path)
    boxes, scores, obj = served(x)
    np.testing.assert_allclose(
        np.asarray(boxes), np.asarray(live_boxes), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(live_scores), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(obj), np.asarray(live_obj), rtol=1e-6, atol=1e-7
    )


def test_int8_quantized_export_matches_live(tmp_path):
    """The fastest serving config — int8 PTQ with the activation-flow
    plan — exports too (quantized weights and scales bake in as
    constants)."""
    from bcnn_tpu.ops.quant import calibrate, quantize_weights

    net = Net(Mode.PREDICT)
    net.set_input_shape(32, 32, 3, 2)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.LRELU, 1,
        "input", "c1",
    )
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_convolutional_layer(
        12, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0,
        "p1", "c2",
    )
    net.add_fullc_layer(5, FillerType.MSRA, Activation.NONE, 0, "c2", "f")
    sess = Session(net, 0).compile_net()
    rng = np.random.RandomState(0)
    for k in sess.params:
        a = np.asarray(sess.params[k])
        sess.params[k] = rng.randn(*a.shape).astype(np.float32) * 0.2
    for k in sess.state:
        a = np.asarray(sess.state[k])
        sess.state[k] = (
            (np.abs(rng.randn(*a.shape)) + 0.5)
            if "run_var" in k
            else rng.randn(*a.shape) * 0.1
        ).astype(np.float32)
    calib = rng.rand(4, 3, 32, 32).astype(np.float32)
    scales = calibrate(net, sess.params, sess.state, [calib])
    net.quant = {
        "act_scales": scales,
        "weights": quantize_weights(net, sess.params),
    }

    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    (live,), _ = sess.predict_on_batch(x, outputs=["f"])
    served = load_exported(
        export_forward(net, sess.params, sess.state, outputs=["f"])
    )
    (got,) = served(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(live), rtol=1e-5, atol=1e-6
    )


def test_multi_platform_export_runs_on_cpu():
    """One artifact can carry lowerings for several platforms (e.g. the
    TPU serving fleet + a CPU smoke-test harness)."""
    net = classif_net()
    sess = Session(net, 0).compile_net()
    blob = export_forward(
        net, sess.params, sess.state, platforms=("tpu", "cpu")
    )
    served = load_exported(blob)
    assert served.platforms == ("tpu", "cpu")
    x = np.random.RandomState(3).randn(4, 3, 16, 16).astype(np.float32)
    (got,) = served(x)  # runs on the cpu lowering here
    assert np.isfinite(np.asarray(got)).all()


def test_exported_call_accepts_device_arrays():
    """Serving fast path: an already-on-device batch must go straight to
    the compiled call (no host bounce — that measured ~20 s/call for a
    531 MB batch through the device relay) and match the numpy path."""
    import jax.numpy as jnp

    net = classif_net()
    sess = Session(net, 0).compile_net()
    served = load_exported(
        export_forward(net, sess.params, sess.state, outputs=["s"])
    )
    x = np.random.RandomState(4).randn(4, 3, 16, 16).astype(np.float32)
    (from_np,) = served(x)
    (from_dev,) = served(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(from_np), np.asarray(from_dev))


def test_detect_export_requires_yolo():
    net = classif_net()
    sess = Session(net, 0).compile_net()
    from bcnn_tpu.deploy import export_detect

    with pytest.raises(ValueError, match="YOLO"):
        export_detect(net, sess.params, sess.state)
