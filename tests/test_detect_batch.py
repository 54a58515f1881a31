"""Fully on-device batched detection (forward + fused decode + NMS)."""

import numpy as np

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import yolov3_tiny


def test_detect_on_batch_shapes_and_consistency():
    net = yolov3_tiny(batch_size=2, width=128, height=128, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, 0).compile_net()
    x = np.random.RandomState(0).randn(2, 3, 128, 128).astype(np.float32)
    boxes, scores, obj = sess.detect_on_batch(
        x, thresh=0.3, max_dets=20, use_pallas=False
    )
    assert np.asarray(boxes).shape == (2, 20, 4)
    assert np.asarray(scores).shape == (2, 20, 4)
    assert np.asarray(obj).shape == (2, 20)
    obj = np.asarray(obj)
    # surviving entries must exceed the threshold; zeros are suppressed slots
    assert ((obj == 0) | (obj > 0.3)).all()

    # host path agreement on surviving objectness values (no letterbox:
    # w==netw, h==neth makes correct_region_boxes identity)
    dets = sess.yolo_get_detections(x, 128, 128, 128, 128, thresh=0.3)
    host_alive = sorted(
        round(d["objectness"], 5) for d in dets if d["objectness"] > 0
    )
    dev_alive = sorted(round(float(v), 5) for v in obj[0] if v > 0)
    assert dev_alive == host_alive[: len(dev_alive)] or \
        dev_alive == sorted(host_alive)[-len(dev_alive):] or \
        set(dev_alive) <= set(host_alive)
