"""mAP evaluator tests: hand-computed AP cases, matching semantics, and
the end-to-end map_eval over a detection session (beyond-reference
detection-quality metric; see metrics_det.py)."""

import numpy as np

from bcnn_tpu.metrics_det import (
    average_precision,
    dets_to_rows,
    evaluate_detections,
    match_detections,
)


def box(x, y, w, h):
    return [x, y, w, h]


def test_ap_hand_computed_all_point():
    # 2 GT total; dets sorted: TP@0.9, FP@0.8
    # recall [0.5, 0.5], precision [1.0, 0.5] -> all-point AP = 0.5
    ap = average_precision(
        np.array([0.9, 0.8]), np.array([True, False]), n_gt=2
    )
    np.testing.assert_allclose(ap, 0.5)


def test_ap_hand_computed_101_point():
    # same case, COCO grid: recall<=0.5 gets precision 1.0 (51 points),
    # recall>0.5 gets 0 -> 51/101
    ap = average_precision(
        np.array([0.9, 0.8]), np.array([True, False]), n_gt=2,
        interpolation="101",
    )
    np.testing.assert_allclose(ap, 51 / 101)


def test_ap_perfect_and_empty():
    assert average_precision(
        np.array([0.9, 0.8]), np.array([True, True]), 2
    ) == 1.0
    assert average_precision(np.zeros(0), np.zeros(0, bool), 3) == 0.0
    assert np.isnan(average_precision(np.array([0.5]), np.array([True]), 0))


def test_matching_greedy_highest_iou():
    # det claims the HIGHEST-IoU unmatched GT; second det of lower score
    # cannot steal it
    gts = np.array([box(0.5, 0.5, 0.2, 0.2), box(0.52, 0.5, 0.2, 0.2)])
    dets = np.array(
        [
            box(0.52, 0.5, 0.2, 0.2) + [0.9],  # exact match to gt[1]
            box(0.52, 0.5, 0.2, 0.2) + [0.8],  # gt[1] taken -> gt[0]
            box(0.52, 0.5, 0.2, 0.2) + [0.7],  # nothing left above 0.5
        ]
    )
    m = match_detections(dets, gts, 0.5)
    assert m.tolist() == [True, True, False]


def test_matching_threshold():
    gts = np.array([box(0.5, 0.5, 0.2, 0.2)])
    dets = np.array([box(0.8, 0.8, 0.2, 0.2) + [0.9]])  # IoU 0
    assert match_detections(dets, gts, 0.5).tolist() == [False]


def test_evaluate_perfect_detections():
    gts = [
        np.array([box(0.3, 0.3, 0.2, 0.2) + [0], box(0.7, 0.7, 0.3, 0.3) + [1]]),
        np.array([box(0.5, 0.5, 0.4, 0.4) + [0]]),
    ]
    preds = [
        np.array(
            [
                box(0.3, 0.3, 0.2, 0.2) + [0.9, 0],
                box(0.7, 0.7, 0.3, 0.3) + [0.8, 1],
            ]
        ),
        np.array([box(0.5, 0.5, 0.4, 0.4) + [0.95, 0]]),
    ]
    res = evaluate_detections(preds, gts, num_classes=2)
    assert res["map50"] == 1.0
    assert res["map"] == 1.0
    assert res["n_gt"].tolist() == [2, 1]


def test_evaluate_absent_class_excluded():
    gts = [np.array([box(0.5, 0.5, 0.2, 0.2) + [0]])]
    preds = [np.array([box(0.5, 0.5, 0.2, 0.2) + [0.9, 0]])]
    res = evaluate_detections(preds, gts, num_classes=3)
    assert res["map50"] == 1.0  # classes 1,2 have no GT: nan, excluded
    assert np.isnan(res["ap"][0, 1]) and np.isnan(res["ap"][0, 2])


def test_evaluate_localization_quality_separates_thresholds():
    # det shifted by 0.1: IoU = 0.12/0.20 = 0.6 -> TP at 0.5, FP at 0.75
    gts = [np.array([box(0.5, 0.5, 0.4, 0.4) + [0]])]
    preds = [np.array([box(0.6, 0.5, 0.4, 0.4) + [0.9, 0]])]
    res = evaluate_detections(
        preds, gts, num_classes=1, iou_thresholds=(0.5, 0.75)
    )
    assert res["ap"][0, 0] == 1.0
    assert res["ap"][1, 0] == 0.0


def test_dets_to_rows():
    boxes = np.array([box(0.1, 0.1, 0.2, 0.2), box(0.5, 0.5, 0.2, 0.2)])
    scores = np.array([[0.0, 0.7], [0.0, 0.0]])  # slot 1 suppressed
    rows = dets_to_rows(boxes, scores)
    assert rows.shape == (1, 6)
    np.testing.assert_allclose(rows[0, :4], boxes[0])
    assert rows[0, 4] == 0.7 and rows[0, 5] == 1


def test_map_eval_session_end_to_end(tmp_path):
    """map_eval over a real detection session: untrained net on the
    synthetic set scores ~0; a 'cheating' check with GT-derived preds
    scores 1 (wiring sanity, not model quality)."""
    from tests.test_training_parity import YOLO_CONF, write_detection_set
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net
    from bcnn_tpu.metrics_det import map_eval
    from bcnn_tpu.types import LoaderType

    lst = write_detection_set(tmp_path, n=8)
    conf = tmp_path / "m.conf"
    conf.write_text(
        YOLO_CONF.format(img=lst, init="", out="x")
        .replace("input_model=\n", "")
        .replace("source_train=", "source_test=")
    )
    net = Net(Mode.VALID)
    load_net(net, str(conf))
    sess = Session(net, seed=0).compile_net()
    sess.set_data_loader(LoaderType.DETECTION_LIST, lst, None, lst, None)
    sess.set_mode(Mode.VALID)
    res = map_eval(sess, num_images=8)
    assert 0.0 <= res["map50"] <= 0.3  # untrained: near zero
    assert int(res["n_gt"].sum()) == 8


def test_map_eval_exact_image_count(tmp_path):
    """map_eval evaluates EXACTLY num_images: a non-batch-multiple count
    (5 at batch 4) covers the tail batch and slices off the wrapped
    extras; a sub-batch count (3 at batch 4) does not double-count the
    stream-wrap duplicates. One GT box per image, so n_gt.sum() is the
    image count."""
    from tests.test_training_parity import YOLO_CONF, write_detection_set
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net
    from bcnn_tpu.metrics_det import map_eval
    from bcnn_tpu.types import LoaderType

    lst = write_detection_set(tmp_path, n=8)
    conf = tmp_path / "m.conf"
    conf.write_text(
        YOLO_CONF.format(img=lst, init="", out="x")
        .replace("input_model=\n", "")
        .replace("source_train=", "source_test=")
    )
    net = Net(Mode.VALID)
    load_net(net, str(conf))
    sess = Session(net, seed=0).compile_net()
    sess.set_data_loader(LoaderType.DETECTION_LIST, lst, None, lst, None)

    for n in (5, 3):  # batch_size is 4: one over, one under
        sess.set_mode(Mode.VALID)  # rewind the eval stream
        res = map_eval(sess, num_images=n)
        assert int(res["n_gt"].sum()) == n
