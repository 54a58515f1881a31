"""End-to-end Darknet flow: the reference's yolov3-tiny.cfg + a
synthesized .weights file (correct darknet layout) -> load_net ->
forward -> detections. Exercises the full user path of the yolo example."""

import os
import struct

import numpy as np
import pytest

# vendored recipe (examples/yolo/); identical to the reference's
# examples/yolo/yolov3-tiny.cfg — the repo is self-contained for the
# flagship model's config-file path
REF_CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "yolo", "yolov3-tiny.cfg",
)


def test_vendored_cfg_matches_reference_when_mounted():
    ref = "/root/reference/examples/yolo/yolov3-tiny.cfg"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    with open(REF_CFG) as a, open(ref) as b:
        assert a.read() == b.read()


def synth_darknet_weights(net, path, seed=0):
    """Write a .weights file in darknet order for the built graph."""
    from bcnn_tpu.types import Activation, LayerType

    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", 0, 2, 0))
        f.write(struct.pack("<Q", 0))
        for node in net.nodes:
            if node.type not in (
                LayerType.CONV2D,
                LayerType.TRANSPOSE_CONV2D,
                LayerType.DEPTHWISE_CONV2D,
            ):
                continue
            tw = net.tensors[node.src[1]]
            tb = net.tensors[node.src[2]]
            n_out = int(np.prod(tb.mem_shape))
            (rng.randn(n_out) * 0.05).astype(np.float32).tofile(f)  # bias
            if node.param.get("batch_norm"):
                (rng.rand(n_out) * 0.5 + 0.75).astype(np.float32).tofile(
                    f
                )  # scales
                (rng.randn(n_out) * 0.1).astype(np.float32).tofile(f)  # mean
                (rng.rand(n_out) * 0.5 + 0.5).astype(np.float32).tofile(
                    f
                )  # var
            w_sz = int(np.prod(tw.mem_shape))
            (rng.randn(w_sz) * 0.05).astype(np.float32).tofile(f)


def test_yolov3_tiny_cfg_weights_detections(tmp_path):
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net

    # first parse without weights to learn tensor sizes, then synthesize
    net0 = Net(Mode.PREDICT)
    from bcnn_tpu.config import (
        LayerParam, add_layer, layer_param_set, net_set_param, parse_ini,
    )

    sections = parse_ini(REF_CFG)
    for k, v in sections[0].keys:
        net_set_param(net0, k, v)
    for i in range(1, len(sections)):
        lp = LayerParam()
        for k, v in sections[i].keys:
            layer_param_set(lp, i, k, v, fmt=1)
        if lp.src_id is None:
            lp.src_id = [f"lid{i-1}"]
        if lp.dst_id is None:
            lp.dst_id = f"lid{i}"
        add_layer(net0, sections[i].name, lp)
    net0.resize(160, 160)  # keep the CPU forward cheap

    weights = str(tmp_path / "yolov3-tiny.weights")
    synth_darknet_weights(net0, weights)

    # the real user path: cfg + .weights through load_net
    net = Net(Mode.PREDICT)
    load_net(net, REF_CFG, weights)
    net.resize(160, 160)
    assert net.bn_folded  # PREDICT load folds BN
    sess = Session(net, 0).compile_net()

    x = np.random.RandomState(1).rand(1, 3, 160, 160).astype(np.float32)
    dets = sess.yolo_get_detections(x, 160, 160, 160, 160, thresh=0.3)
    # random weights: just prove the full path runs and yields sane values
    for d in dets:
        assert 0 <= d["objectness"] <= 1
        assert np.isfinite([d["x"], d["y"], d["w"], d["h"]]).all()
        assert d["prob"].shape == (80,)
