"""YOLOv3-tiny (transcribed) and full YOLOv3 (parsed from the vendored
Darknet recipe), from examples/yolo/yolov3-tiny.cfg / yolov3.cfg.

Layer sequence (Darknet section indices in comments match the cfg, so
tensor names line up with the lid<N> names the config loader would produce
— weights loaded via either path land identically).
"""

from __future__ import annotations

import os

from ..graph import Net
from ..types import Activation, FillerType, Mode, Padding

ANCHORS = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]


def yolov3_tiny(
    batch_size: int = 1,
    width: int = 416,
    height: int = 416,
    classes: int = 80,
    mode: Mode = Mode.PREDICT,
) -> Net:
    net = Net(mode)
    net.set_input_shape(width, height, 3, batch_size)
    if mode != Mode.PREDICT:
        net.set_sgd_optimizer(learning_rate=0.001, momentum=0.9)
        net.set_weight_regularizer(0.0005)
    anchors = [float(a) for a in ANCHORS]
    X, F, L = FillerType.XAVIER, Activation.LRELU, Activation.NONE

    def conv(n, k, s, p, bn, act, src, dst):
        net.add_convolutional_layer(n, k, s, p, 1, bn, X, act, 0, src, dst)

    conv(16, 3, 1, 1, 1, F, "input", "lid1")          # 1
    net.add_maxpool_layer(2, 2, Padding.SAME, "lid1", "lid2")   # 2
    conv(32, 3, 1, 1, 1, F, "lid2", "lid3")           # 3
    net.add_maxpool_layer(2, 2, Padding.SAME, "lid3", "lid4")   # 4
    conv(64, 3, 1, 1, 1, F, "lid4", "lid5")           # 5
    net.add_maxpool_layer(2, 2, Padding.SAME, "lid5", "lid6")   # 6
    conv(128, 3, 1, 1, 1, F, "lid6", "lid7")          # 7
    net.add_maxpool_layer(2, 2, Padding.SAME, "lid7", "lid8")   # 8
    conv(256, 3, 1, 1, 1, F, "lid8", "lid9")          # 9 (route target)
    net.add_maxpool_layer(2, 2, Padding.SAME, "lid9", "lid10")  # 10
    conv(512, 3, 1, 1, 1, F, "lid10", "lid11")        # 11
    net.add_maxpool_layer(2, 1, Padding.SAME, "lid11", "lid12")  # 12 (s1!)
    conv(1024, 3, 1, 1, 1, F, "lid12", "lid13")       # 13
    conv(256, 1, 1, 0, 1, F, "lid13", "lid14")        # 14 (route -4 target)
    conv(512, 3, 1, 1, 1, F, "lid14", "lid15")        # 15
    n_out = 3 * (classes + 5)
    conv(n_out, 1, 1, 0, 0, L, "lid15", "lid16")      # 16
    net.add_yolo_layer(
        3, classes, 4, 6, [3, 4, 5], anchors, "lid16", "lid17"
    )                                                  # 17 (13x13 head)
    net.add_concat_layer(["lid14"], "lid18")          # 18 [route] -4
    conv(128, 1, 1, 0, 1, F, "lid18", "lid19")        # 19
    net.add_upsample_layer(2, "lid19", "lid20")       # 20
    net.add_concat_layer(["lid20", "lid9"], "lid21")  # 21 [route] -1,8
    conv(256, 3, 1, 1, 1, F, "lid21", "lid22")        # 22
    conv(n_out, 1, 1, 0, 0, L, "lid22", "lid23")      # 23
    net.add_yolo_layer(
        3, classes, 4, 6, [0, 1, 2], anchors, "lid23", "lid24"
    )                                                  # 24 (26x26 head)
    return net


def yolov3(
    batch_size: int = 1,
    width: int = 608,
    height: int = 608,
    classes: int = 80,
    mode: Mode = Mode.PREDICT,
    cfg_path: str = None,
) -> Net:
    """Full YOLOv3 (Darknet-53 backbone, 75 convs, 23 shortcuts, 3 heads
    at strides 32/16/8), built by parsing the vendored
    examples/yolo/yolov3.cfg — so tensor names are the loader's lid<N>
    and Darknet .weights files load directly. `classes` rewrites the
    [yolo] sections and their preceding conv filter counts (the standard
    Darknet recipe edit). `cfg_path` overrides the recipe location when
    the package is used without the repo's examples/ tree."""
    from ..config import (
        LayerParam,
        add_layer,
        layer_param_set,
        net_set_param,
        parse_ini,
    )

    cfg = cfg_path or os.path.join(
        os.path.dirname(__file__), "..", "..", "examples", "yolo",
        "yolov3.cfg",
    )
    if not os.path.exists(cfg):
        raise FileNotFoundError(
            f"yolov3 recipe not found at {cfg}; pass cfg_path= pointing at "
            "a yolov3.cfg (vendored copy: examples/yolo/yolov3.cfg in the "
            "bcnn-tpu repository)"
        )
    sections = parse_ini(cfg)
    net = Net(mode)
    for k, v in sections[0].keys:
        net_set_param(net, k, v)
    net.set_input_shape(width, height, 3, batch_size)

    if classes != 80:
        n_out = 3 * (classes + 5)
        for i, sec in enumerate(sections):
            if sec.name == "[yolo]":
                sec.keys = [
                    (k, str(classes) if k == "classes" else v)
                    for k, v in sec.keys
                ]
                prev = sections[i - 1]
                prev.keys = [
                    (k, str(n_out) if k == "filters" else v)
                    for k, v in prev.keys
                ]

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
