"""YOLO layer tests: head activation slices, training deltas vs a direct
numpy transcription of the reference algorithm (bcnn_yolo.c:250-414),
decode/NMS host-device consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bcnn_tpu.ops import yolo as Y
from bcnn_tpu.types import DETECTION_MAX_BOXES, Mode


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_iou(a, b):
    iw = min(a[0] + a[2] / 2, b[0] + b[2] / 2) - max(
        a[0] - a[2] / 2, b[0] - b[2] / 2
    )
    ih = min(a[1] + a[3] / 2, b[1] + b[3] / 2) - max(
        a[1] - a[3] / 2, b[1] - b[3] / 2
    )
    if iw < 0 or ih < 0:
        return 0.0
    i = iw * ih
    u = a[2] * a[3] + b[2] * b[3] - i
    return i / u if u else 0.0


def reference_deltas(y, label, anchors, mask, total, classes, net_w, net_h):
    """Direct numpy transcription of the training part of
    bcnn_forward_yolo_layer_cpu. y: (N,H,W,A,5+K) *activated*."""
    n, h, w, num, e = y.shape
    delta = np.zeros_like(y)
    label = label.reshape(n, DETECTION_MAX_BOXES, 5)
    for b in range(n):
        # noobj pass
        for j in range(h):
            for i in range(w):
                for a in range(num):
                    m = mask[a]
                    bx = (i + y[b, j, i, a, 0]) / w
                    by = (j + y[b, j, i, a, 1]) / h
                    bw = np.exp(y[b, j, i, a, 2]) * anchors[2 * m] / net_w
                    bh = np.exp(y[b, j, i, a, 3]) * anchors[2 * m + 1] / net_h
                    best = 0.0
                    for t in range(DETECTION_MAX_BOXES):
                        tr = label[b, t]
                        if tr[0] == 0:
                            break
                        best = max(
                            best, np_iou((bx, by, bw, bh), tr[:4])
                        )
                    delta[b, j, i, a, 4] = y[b, j, i, a, 4]
                    if best > 0.5:
                        delta[b, j, i, a, 4] = 0.0
        # truth pass
        for t in range(DETECTION_MAX_BOXES):
            tr = label[b, t]
            if tr[0] == 0:
                break
            i = int(tr[0] * w)
            j = int(tr[1] * h)
            best_iou, best_n = 0.0, 0
            for a in range(total):
                pw = anchors[2 * a] / net_w
                ph = anchors[2 * a + 1] / net_h
                iou = np_iou((0, 0, pw, ph), (0, 0, tr[2], tr[3]))
                if iou > best_iou:
                    best_iou, best_n = iou, a
            if best_n not in mask:
                continue
            a = mask.index(best_n)
            scale = 2 - tr[2] * tr[3]
            tx = tr[0] * w - i
            ty = tr[1] * h - j
            tw = np.log(tr[2] * net_w / anchors[2 * best_n])
            th = np.log(tr[3] * net_h / anchors[2 * best_n + 1])
            delta[b, j, i, a, 0] = -scale * (tx - y[b, j, i, a, 0])
            delta[b, j, i, a, 1] = -scale * (ty - y[b, j, i, a, 1])
            delta[b, j, i, a, 2] = -scale * (tw - y[b, j, i, a, 2])
            delta[b, j, i, a, 3] = -scale * (th - y[b, j, i, a, 3])
            delta[b, j, i, a, 4] = y[b, j, i, a, 4] - 1
            cls = int(tr[4])
            # delta_yolo_class (bcnn_yolo.c:187-206): if the slot's class-0
            # delta is already nonzero (earlier truth wrote here), only the
            # truth's own class channel is set — class deltas MERGE
            if delta[b, j, i, a, 5] != 0:
                delta[b, j, i, a, 5 + cls] = y[b, j, i, a, 5 + cls] - 1
            else:
                for k in range(classes):
                    delta[b, j, i, a, 5 + k] = y[b, j, i, a, 5 + k] - (
                        1 if k == cls else 0
                    )
    return delta


def make_param(num=3, classes=4, total=6):
    anchors = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319][: total * 2]
    return dict(
        num=num,
        classes=classes,
        coords=4,
        total=total,
        mask=list(range(total - num, total)),  # last `num` anchors
        anchors=[float(a) for a in anchors],
        net_w=416,
        net_h=416,
    )


def test_yolo_head_slices():
    p = make_param()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 3, p["num"] * 9).astype(np.float32)
    y = np.asarray(Y.yolo_head(jnp.asarray(x), p["num"], p["classes"]))
    xr = x.reshape(2, 3, 3, 3, 9)
    yr = y.reshape(2, 3, 3, 3, 9)
    np.testing.assert_allclose(yr[..., 0:2], sigmoid(xr[..., 0:2]), rtol=1e-5)
    np.testing.assert_allclose(yr[..., 2:4], xr[..., 2:4], rtol=1e-6)
    np.testing.assert_allclose(yr[..., 4:], sigmoid(xr[..., 4:]), rtol=1e-5)


def test_yolo_train_deltas_match_reference():
    p = make_param()
    rng = np.random.RandomState(1)
    n, h, w = 2, 4, 4
    x = rng.randn(n, h, w, p["num"] * 9).astype(np.float32)
    y = np.asarray(Y.yolo_head(jnp.asarray(x), p["num"], p["classes"]))
    label = np.zeros((n, DETECTION_MAX_BOXES * 5), np.float32)
    # two boxes on sample 0, one on sample 1
    label[0, 0:5] = [0.3, 0.4, 0.25, 0.3, 2]
    label[0, 5:10] = [0.72, 0.6, 0.6, 0.7, 1]
    label[1, 0:5] = [0.5, 0.5, 0.12, 0.1, 3]
    got = np.asarray(
        Y.yolo_train_deltas(
            jnp.asarray(y), jnp.asarray(label), p, p["net_w"], p["net_h"]
        )
    ).reshape(n, h, w, p["num"], 9)
    want = reference_deltas(
        y.reshape(n, h, w, p["num"], 9),
        label,
        p["anchors"],
        p["mask"],
        p["total"],
        p["classes"],
        p["net_w"],
        p["net_h"],
    )
    # oracle runs in float64; 2e-4 covers float32 exp/log noise
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_yolo_one_pass_deltas_equal_loop():
    """The one-pass scatter-max formulation must match the
    ordered-overwrite fori_loop, including truth collisions on the same
    (cell, anchor) slot where the later truth index must win. Equality is
    up to fp32 fusion noise (~1e-7): the two HLOs contract the identical
    arithmetic differently."""
    p = make_param()
    rng = np.random.RandomState(7)
    n, h, w = 3, 5, 5
    for trial in range(4):
        x = rng.randn(n, h, w, p["num"] * 9).astype(np.float32)
        y = Y.yolo_head(jnp.asarray(x), p["num"], p["classes"])
        label = np.zeros((n, DETECTION_MAX_BOXES * 5), np.float32)
        nb = rng.randint(1, 12)
        for b in range(n):
            for t in range(nb):
                # coarse quantized centers force frequent slot collisions
                cx = rng.choice([0.15, 0.45, 0.75])
                cy = rng.choice([0.15, 0.45, 0.75])
                bw = rng.choice([0.1, 0.3, 0.8])
                bh = rng.choice([0.1, 0.3, 0.8])
                label[b, 5 * t : 5 * t + 5] = [cx, cy, bw, bh,
                                               rng.randint(0, 4)]
        one = np.asarray(
            Y.yolo_train_deltas(
                y, jnp.asarray(label), p, p["net_w"], p["net_h"]
            )
        )
        loop = np.asarray(
            Y._yolo_train_deltas_loop(
                y, jnp.asarray(label), p, p["net_w"], p["net_h"]
            )
        )
        np.testing.assert_allclose(one, loop, rtol=1e-5, atol=1e-6)


def test_yolo_shared_slot_class_deltas_merge():
    """Two truths of different classes on the SAME (cell, anchor) slot:
    the reference's delta_yolo_class takes the `if (delta[index])` branch
    for the second truth, leaving the first truth's class deltas in place
    and setting only the second's channel to out-1 — the final class row
    is out - multihot, not the last writer's one-hot. Both formulations
    and the numpy oracle must agree."""
    p = make_param(num=3, classes=4, total=6)
    p["mask"] = [0, 1, 2]  # own the small anchors so 0.3-boxes match
    rng = np.random.RandomState(11)
    n, h, w = 2, 6, 6
    x = rng.randn(n, h, w, p["num"] * 9).astype(np.float32)
    y = Y.yolo_head(jnp.asarray(x), p["num"], p["classes"])
    label = np.zeros((n, DETECTION_MAX_BOXES * 5), np.float32)
    # same cell (0.52, 0.52), same shape -> same best anchor, classes 2, 1
    label[0, 0:5] = [0.52, 0.52, 0.08, 0.08, 2]
    label[0, 5:10] = [0.53, 0.51, 0.08, 0.08, 1]
    # and a third truth stacked on the same slot, class 0
    label[0, 10:15] = [0.51, 0.53, 0.08, 0.08, 0]
    yn = np.asarray(y)
    want = reference_deltas(
        yn.reshape(n, h, w, p["num"], 9), label, p["anchors"], p["mask"],
        p["total"], p["classes"], p["net_w"], p["net_h"],
    )
    for fn in (Y.yolo_train_deltas, Y._yolo_train_deltas_loop):
        got = np.asarray(
            fn(y, jnp.asarray(label), p, p["net_w"], p["net_h"])
        ).reshape(n, h, w, p["num"], 9)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
    # the slot's class row must differ from a pure last-writer overwrite:
    # channels of classes 2 AND 1 AND 0 all carry out-1
    cj, ci = int(0.52 * h), int(0.52 * w)
    a = int(np.argmax(np.abs(want[0, cj, ci, :, 0])))
    row = want[0, cj, ci, a, 5:]
    yrow = yn.reshape(n, h, w, p["num"], 9)[0, cj, ci, a, 5:]
    np.testing.assert_allclose(row[:3], yrow[:3] - 1, atol=2e-4)
    np.testing.assert_allclose(row[3], yrow[3], atol=2e-4)


def test_yolo_train_stats_match_oracle():
    """with_stats sums must equal a direct numpy accumulation of the
    reference's counters (bcnn_yolo.c:258-264, 313, 373-398)."""
    p = make_param(num=3, classes=4, total=6)
    p["mask"] = [0, 1, 2]
    rng = np.random.RandomState(3)
    n, h, w = 3, 6, 6
    x = rng.randn(n, h, w, p["num"] * 9).astype(np.float32)
    y = Y.yolo_head(jnp.asarray(x), p["num"], p["classes"])
    label = np.zeros((n, DETECTION_MAX_BOXES * 5), np.float32)
    label[0, 0:5] = [0.3, 0.4, 0.1, 0.12, 2]
    label[0, 5:10] = [0.7, 0.6, 0.3, 0.3, 1]
    label[1, 0:5] = [0.5, 0.5, 0.09, 0.1, 3]
    _, stats = Y.yolo_train_deltas(
        y, jnp.asarray(label), p, p["net_w"], p["net_h"], with_stats=True
    )
    yn = np.asarray(y).reshape(n, h, w, p["num"], 9)
    iou_sum = obj_sum = cat_sum = r50 = r75 = cnt = 0.0
    lab = label.reshape(n, DETECTION_MAX_BOXES, 5)
    for b in range(n):
        for t in range(DETECTION_MAX_BOXES):
            tr = lab[b, t]
            if tr[0] == 0:
                break
            best_iou, best_n = 0.0, 0
            for a_ in range(p["total"]):
                pw = p["anchors"][2 * a_] / p["net_w"]
                ph = p["anchors"][2 * a_ + 1] / p["net_h"]
                iou = np_iou((0, 0, pw, ph), (0, 0, tr[2], tr[3]))
                if iou > best_iou:
                    best_iou, best_n = iou, a_
            if best_n not in p["mask"]:
                continue
            a = p["mask"].index(best_n)
            i, j = int(tr[0] * w), int(tr[1] * h)
            px = (i + yn[b, j, i, a, 0]) / w
            py = (j + yn[b, j, i, a, 1]) / h
            pw = np.exp(yn[b, j, i, a, 2]) * p["anchors"][2 * best_n] / p["net_w"]
            ph = np.exp(yn[b, j, i, a, 3]) * p["anchors"][2 * best_n + 1] / p["net_h"]
            iou = np_iou((px, py, pw, ph), tr[:4])
            iou_sum += iou
            r50 += iou > 0.5
            r75 += iou > 0.75
            obj_sum += yn[b, j, i, a, 4]
            cat_sum += yn[b, j, i, a, 5 + int(tr[4])]
            cnt += 1
    assert cnt > 0
    np.testing.assert_allclose(float(stats["count"]), cnt)
    np.testing.assert_allclose(float(stats["iou_sum"]), iou_sum, rtol=1e-4)
    np.testing.assert_allclose(float(stats["obj_sum"]), obj_sum, rtol=1e-5)
    np.testing.assert_allclose(float(stats["cat_sum"]), cat_sum, rtol=1e-5)
    np.testing.assert_allclose(float(stats["recall50"]), r50)
    np.testing.assert_allclose(float(stats["recall75"]), r75)
    np.testing.assert_allclose(
        float(stats["anyobj_sum"]), yn[..., 4].sum(), rtol=1e-5
    )
    assert float(stats["n_slots"]) == n * h * w * p["num"]


def test_yolo_surrogate_grad_equals_delta():
    """autodiff of sum(sg(delta)*x) w.r.t. x must equal delta — the
    reference's backward copies dst grad into src grad verbatim."""
    p = make_param(num=2, classes=2, total=4)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 3, 3, 2 * 7).astype(np.float32))
    label = np.zeros((1, DETECTION_MAX_BOXES * 5), np.float32)
    label[0, 0:5] = [0.5, 0.5, 0.3, 0.4, 1]
    label = jnp.asarray(label)

    def loss(x):
        _, aux = Y.yolo_forward(x, label, p, Mode.TRAIN, 1)
        return aux[0]

    g = jax.grad(loss)(x)
    y = Y.yolo_head(x, 2, 2)
    delta = Y.yolo_train_deltas(y, label, p, p["net_w"], p["net_h"])
    np.testing.assert_allclose(np.asarray(g), np.asarray(delta), rtol=1e-5)


def test_nms_matches_reference_semantics():
    dets = [
        dict(x=0.5, y=0.5, w=0.2, h=0.2, objectness=0.9,
             prob=np.array([0.9, 0.0]), num_classes=2),
        dict(x=0.51, y=0.5, w=0.2, h=0.2, objectness=0.8,
             prob=np.array([0.8, 0.0]), num_classes=2),  # overlaps #1
        dict(x=0.1, y=0.1, w=0.1, h=0.1, objectness=0.7,
             prob=np.array([0.0, 0.7]), num_classes=2),  # separate
    ]
    out = Y.nms_obj(list(dets))
    assert out[0]["objectness"] == 0.9
    assert out[1]["objectness"] == 0.0  # suppressed, slot kept
    assert np.all(out[1]["prob"] == 0)
    assert out[2]["objectness"] == 0.7


def test_device_nms_agrees_with_host():
    rng = np.random.RandomState(3)
    m = 40
    boxes = np.stack(
        [
            rng.uniform(0.2, 0.8, m),
            rng.uniform(0.2, 0.8, m),
            rng.uniform(0.05, 0.3, m),
            rng.uniform(0.05, 0.3, m),
        ],
        axis=1,
    ).astype(np.float32)
    obj = rng.uniform(0, 1, m).astype(np.float32)
    probs = (obj[:, None] * rng.uniform(0, 1, (m, 3))).astype(np.float32)
    thresh = 0.5

    b, p, o = Y.device_decode_nms(
        jnp.asarray(boxes[None]),
        jnp.asarray(obj[None]),
        jnp.asarray(probs[None]),
        max_dets=40,
        thresh=thresh,
        nms_thresh=0.45,
    )
    o = np.asarray(o[0])
    b = np.asarray(b[0])

    dets = [
        dict(x=boxes[i, 0], y=boxes[i, 1], w=boxes[i, 2], h=boxes[i, 3],
             objectness=obj[i] if obj[i] > thresh else 0.0,
             prob=probs[i], num_classes=3)
        for i in range(m)
    ]
    host = Y.nms_obj(dets)
    host_alive = sorted(
        (round(d["objectness"], 5) for d in host if d["objectness"] > 0),
        reverse=True,
    )
    dev_alive = sorted((round(float(v), 5) for v in o if v > 0), reverse=True)
    assert host_alive == dev_alive


def test_letterbox_correction():
    # 640x480 image into 416x416 net: new_w=416, new_h=312
    x, y, w, h = Y.correct_region_boxes(0.5, 0.5, 0.2, 0.3, 640, 480, 416, 416)
    np.testing.assert_allclose(x, 0.5, rtol=1e-6)
    np.testing.assert_allclose(y, 0.5, rtol=1e-5)
    np.testing.assert_allclose(w, 0.2, rtol=1e-6)
    np.testing.assert_allclose(h, 0.3 * 416 / 312, rtol=1e-5)
