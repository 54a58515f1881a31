"""YOLOv3 detection head: forward, training deltas, decode and NMS.

Mirrors src/layers/bcnn_yolo.c:
  - forward (:226-249): logistic on (tx,ty) and (obj + class) slices, raw
    tw/th. Channel layout per anchor a and entry e is c = a*(5+K) + e
    (entry_index :207-215), which on the NHWC channel axis reshapes to
    (..., A, 5+K) directly.
  - training (:250-414): hand-crafted deltas written into the *activated*
    output and copied verbatim to the pre-activation gradient by backward
    (:441-447) — the darknet "BCE-through-sigmoid" trick. Reproduced with
    a surrogate sum(stop_grad(delta) * x) whose autodiff gradient w.r.t.
    x is exactly delta. Reported cost = sum(delta^2) (:404-407).
      * noobj: delta_obj = sigmoid_obj, zeroed where best IoU vs any truth
        > 0.5 (:305-312);
      * for each truth (in order, later overwrites earlier): best anchor by
        shape-only IoU over all `total` anchors; if owned by this layer's
        mask, write box deltas with scale (2 - tw*th), obj delta
        (sigmoid_obj - 1), class deltas (out - onehot) (:321-398);
      * truths terminate at the first x == 0 (:286-289).
  - decode (get_yolo_box :137-145): bx=(i+sx)/W, by=(j+sy)/H,
    bw=exp(tw)*anchor_w/net_w, bh=exp(th)*anchor_h/net_h.
  - letterbox correction (correct_region_boxes :470-496) and
    objectness-sorted greedy NMS at IoU 0.45 (do_nms_obj :511-545).

The decode + NMS also exist as a fully batched on-device path (top-K +
O(K^2) mask matrix) so inference never serializes on the host.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import DETECTION_MAX_BOXES, Mode

NMS_THRESH = 0.45  # bcnn_yolo.c:626
NOOBJ_IOU_THRESH = 0.5  # :310 ("thresh set to default 0.7" comment, 0.5 used)


def yolo_head(x: jax.Array, num: int, classes: int) -> jax.Array:
    """x: (N,H,W,A*(5+K)) raw conv output -> activated head output."""
    n, h, w, _ = x.shape
    e = 5 + classes
    x = x.reshape(n, h, w, num, e)
    xy = jax.nn.sigmoid(x[..., 0:2])
    twh = x[..., 2:4]
    objcls = jax.nn.sigmoid(x[..., 4:])
    return jnp.concatenate([xy, twh, objcls], axis=-1).reshape(
        n, h, w, num * e
    )


def _box_iou(b1, b2):
    """IoU of boxes in (x,y,w,h) center format; broadcasting.
    Matches box_iou (bcnn_yolo.c:108-135): intersection/union with
    union = a+b-i (0/0 -> nan avoided via where)."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    iw = jnp.minimum(x1 + w1 / 2, x2 + w2 / 2) - jnp.maximum(
        x1 - w1 / 2, x2 - w2 / 2
    )
    ih = jnp.minimum(y1 + h1 / 2, y2 + h2 / 2) - jnp.maximum(
        y1 - h1 / 2, y2 - h2 / 2
    )
    inter = jnp.where((iw < 0) | (ih < 0), 0.0, iw * ih)
    union = w1 * h1 + w2 * h2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _decode_grid(y, anchors_wh, mask, net_w, net_h):
    """y: (N,H,W,A,5+K) activated -> boxes (x,y,w,h) each (N,H,W,A)."""
    n, h, w, a, _ = y.shape
    col = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, a), 2)
    row = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, a), 1)
    aw = jnp.asarray([anchors_wh[2 * m] for m in mask], jnp.float32)
    ah = jnp.asarray([anchors_wh[2 * m + 1] for m in mask], jnp.float32)
    bx = (col + y[..., 0]) / w
    by = (row + y[..., 1]) / h
    bw = jnp.exp(y[..., 2]) * aw / net_w
    bh = jnp.exp(y[..., 3]) * ah / net_h
    return bx, by, bw, bh


def yolo_train_deltas(
    y: jax.Array,
    label: jax.Array,
    param: Dict,
    net_w: int,
    net_h: int,
    with_stats: bool = False,
) -> jax.Array:
    """y: (N,H,W,A*(5+K)) activated head output; label (N, 50*5) flat
    [x,y,w,h,class] per truth. Returns delta with dL/d(pre-activation) ==
    delta semantics (reference writes it into dst grad and backward copies
    to src grad).

    with_stats=True additionally returns the per-batch training
    diagnostics the reference accumulates in its truth loop and prints
    every batch (bcnn_yolo.c:258-264, 404-414): sums for Avg IOU / Class /
    Obj / No Obj / .5R / .75R plus the owned-truth count — every OWNED
    truth counts, including ones a later truth overwrites, exactly like
    the reference's per-truth `++count`."""
    num, classes = param["num"], param["classes"]
    anchors = param["anchors"]
    mask = param["mask"]
    total = param["total"]
    e = 5 + classes
    n, h, w, _ = y.shape
    yr = y.reshape(n, h, w, num, e)
    label = label.reshape(n, DETECTION_MAX_BOXES, 5)

    # truth validity: stop at first x == 0 (reference `break`)
    tx = label[..., 0]
    valid = jnp.cumprod((tx != 0).astype(jnp.float32), axis=1)  # (N,50)

    # ---- noobj deltas -------------------------------------------------- #
    bx, by, bw, bh = _decode_grid(yr, anchors, mask, net_w, net_h)
    # IoU of each pred vs each truth: (N,H,W,A,50)
    p = (
        bx[..., None],
        by[..., None],
        bw[..., None],
        bh[..., None],
    )
    tb = tuple(
        label[:, None, None, None, :, i] for i in range(4)
    )  # each (N,1,1,1,50)
    ious = _box_iou(p, tb) * valid[:, None, None, None, :]
    best_iou = jnp.max(ious, axis=-1)  # (N,H,W,A)
    obj = yr[..., 4]
    delta_obj = jnp.where(best_iou > NOOBJ_IOU_THRESH, 0.0, obj)

    # ---- per-truth assignment, one pass -------------------------------- #
    # The reference iterates truths in order, each OVERWRITING the full
    # (5+K)-vector at its target (cell, anchor) with values computed from
    # the *prediction* y only (bcnn_yolo.c:321-398) — the running delta
    # never feeds back into a truth's update. Ordered overwrite is
    # therefore exactly "highest truth index wins": compute all 50 updates
    # batched, scatter-max the truth index per target slot, and gather the
    # winner's update. One scatter + one gather replaces 50 sequential
    # dynamic-update-slices (the round-2 fori_loop cost ~15 ms/step at
    # batch 256; see BENCHMARKS.md).
    anchors_arr = jnp.asarray(anchors, jnp.float32).reshape(total, 2)
    mask_arr = jnp.asarray(mask, jnp.int32)
    T = DETECTION_MAX_BOXES

    txx, tyy = label[..., 0], label[..., 1]  # (N,T)
    tww, thh = label[..., 2], label[..., 3]
    tcls = label[..., 4].astype(jnp.int32)
    # best anchor by shape-only IoU (truth shifted to origin); strict-'>'
    # update in the reference keeps the first max — argmax does too.
    pw = anchors_arr[:, 0] / net_w  # (total,)
    ph = anchors_arr[:, 1] / net_h
    iou_a = _box_iou(
        (
            jnp.zeros((1, 1, total)),
            jnp.zeros((1, 1, total)),
            pw[None, None],
            ph[None, None],
        ),
        (
            jnp.zeros((n, T, 1)),
            jnp.zeros((n, T, 1)),
            tww[..., None],
            thh[..., None],
        ),
    )  # (N,T,total)
    best_n = jnp.argmax(iou_a, axis=-1)  # (N,T)
    eq = mask_arr[None, None, :] == best_n[..., None]  # (N,T,A)
    owned = jnp.any(eq, axis=-1) & (valid > 0)
    mask_n = jnp.argmax(eq, axis=-1)  # first match, (N,T)
    ci = jnp.clip((txx * w).astype(jnp.int32), 0, w - 1)
    cj = jnp.clip((tyy * h).astype(jnp.int32), 0, h - 1)

    # gather current prediction at (b, cj, ci, mask_n) for every truth
    bidx = jnp.arange(n)[:, None]
    cur = yr[bidx, cj, ci, mask_n]  # (N,T,5+K)
    aw = anchors_arr[best_n, 0]
    ah = anchors_arr[best_n, 1]
    scale = 2.0 - tww * thh
    dx = -scale * ((txx * w - ci) - cur[..., 0])
    dy = -scale * ((tyy * h - cj) - cur[..., 1])
    dw = -scale * (jnp.log(tww * net_w / aw) - cur[..., 2])
    dh = -scale * (jnp.log(thh * net_h / ah) - cur[..., 3])
    dobj = cur[..., 4] - 1.0
    onehot = jax.nn.one_hot(tcls, classes)
    # class-delta MERGE (delta_yolo_class, bcnn_yolo.c:187-206): when a
    # later truth lands on an already-written slot, the reference takes the
    # `if (delta[index])` shortcut and only sets THAT truth's class channel
    # to out-1, keeping the earlier truth's other class deltas. The final
    # class row at a multi-truth slot is therefore out - (multi-hot union
    # of the slot's truth classes) — NOT the last writer's one-hot. Box and
    # obj channels DO fully overwrite (delta_yolo_box / :371-373). Exact
    # unless sigmoid saturates output[class 0] to exactly the written
    # one-hot value (logit <= ~-89), where the reference would re-enter the
    # full-write branch — _yolo_train_deltas_loop carries the bit-exact
    # branch and test_yolo.py pins the equivalence.
    hwa = h * w * num
    pos = (cj * w + ci) * num + mask_n  # (N,T)
    pos = jnp.where(owned, pos, hwa)
    same_slot = (pos[:, :, None] == pos[:, None, :]) & owned[:, None, :]
    multihot = jnp.minimum(
        jnp.einsum(
            "ntu,nuk->ntk", same_slot.astype(jnp.float32), onehot
        ),
        1.0,
    )
    dcls = cur[..., 5:] - multihot
    upd = jnp.concatenate(
        [jnp.stack([dx, dy, dw, dh, dobj], axis=-1), dcls], axis=-1
    )  # (N,T,5+K)

    # last-writer-wins: scatter-max the truth index into a flat slot map
    # (one extra dummy slot absorbs non-owned truths), then scatter the
    # WINNING rows only. A gather formulation
    # (take_along_axis(upd, winner) over all HWA slots) materializes an
    # extra head-sized (N,HWA,5+K) tensor — measured +8 ms per 256-batch
    # train step on v5e; the winners-only scatter touches 50 rows.
    t_iota = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (n, T))
    winner = (
        jnp.full((n, hwa + 1), -1, jnp.int32)
        .at[bidx, pos]
        .max(t_iota)[:, :hwa]
    )  # (N,HWA)
    has_winner = winner >= 0
    # did truth t win its slot? (small gather over the 50 truths)
    won = (
        jnp.take_along_axis(
            jnp.pad(winner, ((0, 0), (0, 1)), constant_values=-1),
            pos, axis=1,
        )
        == t_iota
    )  # (N,T); non-owned truths point at the dummy slot (-1 != t)
    # channels != 4 come ONLY from winners: scatter-add into zeros
    # (winners are unique per slot, losers add 0 — exact)
    upd_w = jnp.where(won[..., None], upd, 0.0)
    scat = (
        jnp.zeros((n, hwa + 1, e), yr.dtype)
        .at[bidx, pos, :]
        .add(upd_w)[:, :hwa]
    )
    # channel 4: the noobj delta everywhere a winner did not land
    ch4 = jnp.where(has_winner, scat[..., 4], delta_obj.reshape(n, hwa))
    delta = scat.at[..., 4].set(ch4).reshape(n, h, w, num * e)
    if not with_stats:
        return delta
    # per-batch diagnostics, accumulated per OWNED truth like the
    # reference's loop (bcnn_yolo.c:321-398 + the avg_anyobj sweep :313)
    px = (ci + cur[..., 0]) / w
    py = (cj + cur[..., 1]) / h
    pw_t = jnp.exp(cur[..., 2]) * aw / net_w
    ph_t = jnp.exp(cur[..., 3]) * ah / net_h
    iou_t = _box_iou((px, py, pw_t, ph_t), (txx, tyy, tww, thh))
    ow = owned.astype(jnp.float32)
    cat = jnp.take_along_axis(cur[..., 5:], tcls[..., None], axis=-1)[..., 0]
    stats = {
        "iou_sum": jnp.sum(iou_t * ow),
        "recall50": jnp.sum((iou_t > 0.5) * ow),
        "recall75": jnp.sum((iou_t > 0.75) * ow),
        "obj_sum": jnp.sum(cur[..., 4] * ow),
        "cat_sum": jnp.sum(cat * ow),
        "count": jnp.sum(ow),
        "anyobj_sum": jnp.sum(yr[..., 4]),
        # static divisor w*h*num*batch (:411-412)
        "n_slots": jnp.asarray(float(n * hwa), jnp.float32),
    }
    return delta, stats


def _yolo_train_deltas_loop(
    y: jax.Array,
    label: jax.Array,
    param: Dict,
    net_w: int,
    net_h: int,
) -> jax.Array:
    """Round-2 formulation kept for the equivalence test / perf pin: the
    reference's ordered-overwrite truth loop as a 50-step fori_loop of
    dynamic-update-slices. Semantically identical to yolo_train_deltas."""
    num, classes = param["num"], param["classes"]
    anchors = param["anchors"]
    mask = param["mask"]
    total = param["total"]
    e = 5 + classes
    n, h, w, _ = y.shape
    yr = y.reshape(n, h, w, num, e)
    label = label.reshape(n, DETECTION_MAX_BOXES, 5)
    tx = label[..., 0]
    valid = jnp.cumprod((tx != 0).astype(jnp.float32), axis=1)
    bx, by, bw, bh = _decode_grid(yr, anchors, mask, net_w, net_h)
    p = (bx[..., None], by[..., None], bw[..., None], bh[..., None])
    tb = tuple(label[:, None, None, None, :, i] for i in range(4))
    ious = _box_iou(p, tb) * valid[:, None, None, None, :]
    best_iou = jnp.max(ious, axis=-1)
    obj = yr[..., 4]
    delta_obj = jnp.where(best_iou > NOOBJ_IOU_THRESH, 0.0, obj)
    delta = jnp.zeros_like(yr)
    delta = delta.at[..., 4].set(delta_obj)

    anchors_arr = jnp.asarray(anchors, jnp.float32).reshape(total, 2)
    mask_arr = jnp.asarray(mask, jnp.int32)

    def body(t, delta):
        tb = label[:, t, :]
        v = valid[:, t] > 0
        txx, tyy, tww, thh = tb[:, 0], tb[:, 1], tb[:, 2], tb[:, 3]
        tcls = tb[:, 4].astype(jnp.int32)
        pw = anchors_arr[:, 0] / net_w
        ph = anchors_arr[:, 1] / net_h
        iou_a = _box_iou(
            (jnp.zeros((1, total)), jnp.zeros((1, total)), pw[None], ph[None]),
            (
                jnp.zeros((n, 1)),
                jnp.zeros((n, 1)),
                tww[:, None],
                thh[:, None],
            ),
        )
        best_n = jnp.argmax(iou_a, axis=1)
        eq = mask_arr[None, :] == best_n[:, None]
        owned = jnp.any(eq, axis=1) & v
        mask_n = jnp.argmax(eq, axis=1)
        ci = jnp.clip((txx * w).astype(jnp.int32), 0, w - 1)
        cj = jnp.clip((tyy * h).astype(jnp.int32), 0, h - 1)
        bidx = jnp.arange(n)
        cur = yr[bidx, cj, ci, mask_n]
        aw = anchors_arr[best_n, 0]
        ah = anchors_arr[best_n, 1]
        scale = 2.0 - tww * thh
        dx = -scale * ((txx * w - ci) - cur[:, 0])
        dy = -scale * ((tyy * h - cj) - cur[:, 1])
        dw = -scale * (jnp.log(tww * net_w / aw) - cur[:, 2])
        dh = -scale * (jnp.log(thh * net_h / ah) - cur[:, 3])
        dobj = cur[:, 4] - 1.0
        onehot = jax.nn.one_hot(tcls, classes)
        old = delta[bidx, cj, ci, mask_n]
        # delta_yolo_class (bcnn_yolo.c:187-206), bit-exact branch: when
        # the slot's class-0 delta is already nonzero (an earlier truth
        # wrote here), only THIS truth's class channel is set to out-1;
        # otherwise all class channels are written out - onehot.
        dcls_full = cur[:, 5:] - onehot
        dcls_merge = jnp.where(onehot > 0, cur[:, 5:] - 1.0, old[:, 5:])
        dcls = jnp.where((old[:, 5] != 0)[:, None], dcls_merge, dcls_full)
        upd = jnp.concatenate(
            [jnp.stack([dx, dy, dw, dh, dobj], axis=1), dcls], axis=1
        )
        newv = jnp.where(owned[:, None], upd, old)
        return delta.at[bidx, cj, ci, mask_n].set(newv)

    delta = jax.lax.fori_loop(0, DETECTION_MAX_BOXES, body, delta)
    return delta.reshape(n, h, w, num * e)


def yolo_forward(
    x: jax.Array,
    label: Optional[jax.Array],
    param: Dict,
    mode: Mode,
    batch_size: int,
    with_stats: bool = False,
) -> Tuple[jax.Array, Optional[Tuple]]:
    """Returns (activated output, aux in TRAIN else None). aux is
    (surrogate, cost) or, with_stats, (surrogate, cost, stats dict)."""
    y = yolo_head(x, param["num"], param["classes"])
    if mode != Mode.TRAIN or label is None:
        return y, None
    out = yolo_train_deltas(
        jax.lax.stop_gradient(y),
        label,
        param,
        param["net_w"],
        param["net_h"],
        with_stats=with_stats,
    )
    delta, stats = out if with_stats else (out, None)
    delta = jax.lax.stop_gradient(delta)
    surrogate = jnp.sum(delta * x)
    cost = jnp.sum(jnp.square(delta))
    if with_stats:
        stats = jax.lax.stop_gradient(dict(stats, cost=cost))
        return y, (surrogate, cost, stats)
    return y, (surrogate, cost)


def format_yolo_stats(stats: Dict) -> str:
    """The reference's per-batch stderr line, byte-for-byte
    (bcnn_yolo.c:408-414): means over the owned-truth count (0/0 -> nan,
    like the C float division), No Obj over every (cell, anchor) slot."""
    cnt = float(stats["count"])
    div = (lambda s: float(s) / cnt) if cnt else (lambda s: float("nan"))
    return (
        "Yolo Avg IOU: %f Class: %f Obj: %f No Obj: %f .5R: %f, "
        ".75R: %f num_boxes: %d cost: %f"
        % (
            div(stats["iou_sum"]),
            div(stats["cat_sum"]),
            div(stats["obj_sum"]),
            float(stats["anyobj_sum"]) / float(stats["n_slots"]),
            div(stats["recall50"]),
            div(stats["recall75"]),
            int(cnt),
            float(stats["cost"]),
        )
    )


# ------------------------------------------------------------------------ #
# inference post-processing
# ------------------------------------------------------------------------ #


def correct_region_boxes(x, y, w_box, h_box, w, h, netw, neth, relative=1):
    """Letterbox undo (bcnn_yolo.c:470-496); integer new_w/new_h math kept."""
    if netw / w < neth / h:
        new_w = netw
        new_h = (h * netw) // w
    else:
        new_h = neth
        new_w = (w * neth) // h
    x = (x - (netw - new_w) / 2.0 / netw) / (new_w / netw)
    y = (y - (neth - new_h) / 2.0 / neth) / (new_h / neth)
    w_box = w_box * (netw / new_w)
    h_box = h_box * (neth / new_h)
    if not relative:
        x, w_box = x * w, w_box * w
        y, h_box = y * h, h_box * h
    return x, y, w_box, h_box


def decode_layer(
    y: np.ndarray, param: Dict, net_w: int, net_h: int, thresh: float
) -> List[dict]:
    """Host-side decode of one yolo layer output (N,H,W,A*(5+K)) for one
    batch item already selected: y is (H,W,A*(5+K)). Mirrors the fill loop
    of bcnn_yolo_get_detections (:604-639)."""
    h, w, _ = y.shape
    num, classes = param["num"], param["classes"]
    e = 5 + classes
    yr = y.reshape(h, w, num, e)
    dets = []
    for i in range(h * w):
        row, col = divmod(i, w)
        for a in range(num):
            obj = float(yr[row, col, a, 4])
            if obj <= thresh:
                continue
            m = param["mask"][a]
            bx = (col + float(yr[row, col, a, 0])) / w
            by = (row + float(yr[row, col, a, 1])) / h
            # expf overflow -> inf silently, like the reference's C math
            # (no RuntimeWarning noise on pathological tw/th)
            with np.errstate(over="ignore"):
                bw = (
                    float(np.exp(yr[row, col, a, 2]))
                    * param["anchors"][2 * m]
                    / net_w
                )
                bh = (
                    float(np.exp(yr[row, col, a, 3]))
                    * param["anchors"][2 * m + 1]
                    / net_h
                )
            probs = obj * np.asarray(yr[row, col, a, 5:])
            probs = np.where(probs > thresh, probs, 0.0)
            dets.append(
                dict(
                    x=bx, y=by, w=bw, h=bh, objectness=obj,
                    num_classes=classes, prob=probs,
                )
            )
    return dets


def nms_obj(dets: List[dict], nms_thresh: float = NMS_THRESH) -> List[dict]:
    """Objectness-sorted greedy NMS (do_nms_obj, bcnn_yolo.c:511-545):
    suppressed boxes get objectness 0 and zeroed probs but stay in the
    list, exactly like the reference."""
    dets = sorted(dets, key=lambda d: -d["objectness"])
    for i in range(len(dets)):
        if dets[i]["objectness"] == 0:
            continue
        a = (dets[i]["x"], dets[i]["y"], dets[i]["w"], dets[i]["h"])
        for j in range(i + 1, len(dets)):
            if dets[j]["objectness"] == 0:
                continue
            b = (dets[j]["x"], dets[j]["y"], dets[j]["w"], dets[j]["h"])
            if float(_box_iou_np(a, b)) > nms_thresh:
                dets[j]["objectness"] = 0
                dets[j]["prob"] = np.zeros_like(dets[j]["prob"])
    return dets


def _box_iou_np(a, b):
    iw = min(a[0] + a[2] / 2, b[0] + b[2] / 2) - max(
        a[0] - a[2] / 2, b[0] - b[2] / 2
    )
    ih = min(a[1] + a[3] / 2, b[1] + b[3] / 2) - max(
        a[1] - a[3] / 2, b[1] - b[3] / 2
    )
    if iw < 0 or ih < 0:
        return 0.0
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


# ------------------------------------------------------------------------ #
# fully batched on-device decode + NMS (the TPU fast path)
# ------------------------------------------------------------------------ #


@partial(jax.jit, static_argnames=("max_dets", "thresh", "nms_thresh"))
def device_decode_nms(
    boxes: jax.Array,  # (N, M, 4) xywh relative
    obj: jax.Array,  # (N, M)
    cls_probs: jax.Array,  # (N, M, K) already multiplied by obj
    max_dets: int = 100,
    thresh: float = 0.5,
    nms_thresh: float = NMS_THRESH,
):
    """Vectorized top-K + greedy NMS, no host sync. Returns
    (boxes (N,max_dets,4), scores (N,max_dets,K), objectness (N,max_dets)).
    Greedy suppression by objectness order via an O(K^2) masked scan —
    semantics match do_nms_obj."""
    n, m, _ = boxes.shape
    obj = jnp.where(obj > thresh, obj, 0.0)
    if max_dets > m:  # lax.top_k needs k <= M; pad with dead candidates
        pad = max_dets - m
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        obj = jnp.pad(obj, ((0, 0), (0, pad)))
        cls_probs = jnp.pad(cls_probs, ((0, 0), (0, pad), (0, 0)))
    topv, topi = jax.lax.top_k(obj, max_dets)  # (N,max_dets)
    bsel = jnp.take_along_axis(boxes, topi[..., None], axis=1)
    psel = jnp.take_along_axis(cls_probs, topi[..., None], axis=1)

    x, y, w, h = bsel[..., 0], bsel[..., 1], bsel[..., 2], bsel[..., 3]
    iou = _box_iou(
        (x[..., :, None], y[..., :, None], w[..., :, None], h[..., :, None]),
        (x[..., None, :], y[..., None, :], w[..., None, :], h[..., None, :]),
    )  # (N,K,K)
    suppress_pair = iou > nms_thresh  # i suppresses j (i sorted first)

    def body(i, alive):
        alive_i = alive[:, i][:, None]  # traced index gather, not a slice
        row = suppress_pair[:, i, :] & alive_i & (
            jax.lax.broadcasted_iota(jnp.int32, alive.shape, 1) > i
        )
        return alive & ~row

    alive = topv > 0
    alive = jax.lax.fori_loop(0, max_dets, body, alive)
    keep = alive & (topv > 0)
    return (
        bsel,
        psel * keep[..., None],
        topv * keep,
    )


def _greedy_nms_mask(bsel, valid, max_dets, nms_thresh):
    """Objectness-ordered greedy suppression over already-sorted boxes:
    returns the keep mask (N,K) (same masked O(K^2) scan as
    device_decode_nms; semantics match do_nms_obj)."""
    x, y, w, h = bsel[..., 0], bsel[..., 1], bsel[..., 2], bsel[..., 3]
    iou = _box_iou(
        (x[..., :, None], y[..., :, None], w[..., :, None], h[..., :, None]),
        (x[..., None, :], y[..., None, :], w[..., None, :], h[..., None, :]),
    )
    suppress_pair = iou > nms_thresh

    def body(i, alive):
        alive_i = alive[:, i][:, None]
        row = suppress_pair[:, i, :] & alive_i & (
            jax.lax.broadcasted_iota(jnp.int32, alive.shape, 1) > i
        )
        return alive & ~row

    alive = jax.lax.fori_loop(0, max_dets, body, valid)
    return alive & valid


def device_detect_topk(
    heads: List[jax.Array],  # raw conv outputs (N,Hi,Wi,A*(5+K))
    head_params: List[Dict],
    net_w: int,
    net_h: int,
    max_dets: int = 100,
    thresh: float = 0.5,
    nms_thresh: float = NMS_THRESH,
):
    """Top-k-FIRST batched detection: select the max_dets candidates on the
    raw objectness LOGITS (sigmoid is strictly monotone, so ordering and
    tie-breaking match selecting on sigmoid values), then decode and apply
    the class sigmoids only to the selected rows. The quadratic
    (N, M, K) class-probability tensor of the decode-everything path —
    207 MB HBM for yolov3-tiny at batch 256, K=80 — is never materialized;
    measured 40.9 -> ~35 ms per 256-batch on v5e vs decode-then-top_k.
    Outputs match device_decode_nms value-for-value (test-gated); candidate
    choice can differ from it only on exact fp32 ties of the sigmoid
    (saturated logits), where the reference's own qsort order is equally
    unspecified.

    Row selection has two formulations (BCNN_TOPK_GATHER env knob):
    `onehot` (default) contracts a per-head one-hot of the top-k indices
    against the flat head tensor on the MXU and derives grid/anchor
    metadata by integer arithmetic on the indices; `take` is the original
    take_along_axis row gather + six metadata table gathers. The two are
    value-identical (the one-hot matmul is x*1 + 0*rest with an fp32
    accumulator, exact for fp32 and bf16 heads; test-gated). Measured on
    v5e at batch 1024 (tools/serve_profile.py, round 5): the gather/decode
    stage costs +8.0 ms with `take` — TPU gathers don't vectorize, the
    same pathology as the augmentation warp — and the one-hot matmul
    replaces it for the price of streaming one (N,k,M) bf16 operand."""
    n = heads[0].shape[0]
    e = 5 + head_params[0]["classes"]
    classes = head_params[0]["classes"]

    flat_heads, offsets, sizes, meta = [], [], [], []
    off = 0
    for raw, prm in zip(heads, head_params):
        _, h, w, _ = raw.shape
        flat_heads.append(raw.reshape(n, h * w * prm["num"], e))
        offsets.append(off)
        sizes.append(h * w * prm["num"])
        meta.append((h, w, prm["num"], prm["anchors"], prm["mask"]))
        off += h * w * prm["num"]

    # objectness logits over ALL candidates (the only full-M read). The
    # threshold test runs in SIGMOID space — bit-identical to the
    # decode-everything path's `obj > thresh` (incl. fp32 rounding at the
    # boundary and +/-inf logits) — while the top-k ranks by the logits,
    # which order identically (sigmoid is monotone).
    objl = jnp.concatenate([fh[..., 4] for fh in flat_heads], axis=1)
    masked = jnp.where(jax.nn.sigmoid(objl) > thresh, objl, -jnp.inf)
    k = min(max_dets, masked.shape[1])  # lax.top_k needs k <= M
    topv_l, topi = jax.lax.top_k(masked, k)  # (N,k)
    valid = topv_l > -jnp.inf  # NaN logits compare False, like obj>thresh

    if os.environ.get("BCNN_TOPK_GATHER", "onehot") == "onehot":
        # MXU row-select + arithmetic metadata (see docstring). Candidate
        # flattening is loc-major then anchor (m = loc*A + a), so the
        # grid cell and anchor slot fall out of // and %.
        sel = None
        zero = jnp.zeros(topi.shape, jnp.float32)
        csel, rsel = zero, zero
        gwsel, ghsel, awsel, ahsel = zero, zero, zero, zero
        for fh, o, m, (h, w, num, anchors, mask) in zip(
            flat_heads, offsets, sizes, meta
        ):
            local = topi - o
            inr = (local >= 0) & (local < m)
            lc = jnp.clip(local, 0, m - 1)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
                == lc[..., None]
            ) & inr[..., None]
            part = jnp.einsum(
                "nkm,nme->nke",
                onehot.astype(fh.dtype),
                fh,
                preferred_element_type=jnp.float32,
            )
            sel = part if sel is None else sel + part
            loc = lc // num
            a = lc % num
            inrf = inr.astype(jnp.float32)
            csel = csel + inrf * (loc % w).astype(jnp.float32)
            rsel = rsel + inrf * (loc // w).astype(jnp.float32)
            gwsel = gwsel + inrf * float(w)
            ghsel = ghsel + inrf * float(h)
            awh, ahh = zero, zero
            for ai, mi in enumerate(mask):
                hit = (a == ai).astype(jnp.float32)
                awh = awh + hit * float(anchors[2 * mi])
                ahh = ahh + hit * float(anchors[2 * mi + 1])
            awsel = awsel + inrf * awh
            ahsel = ahsel + inrf * ahh
        sel = sel.astype(flat_heads[0].dtype)
    else:
        # static per-candidate metadata tables + row/table gathers
        cols, rows, gws, ghs, aws, ahs = [], [], [], [], [], []
        for (h, w, num, anchors, mask), m in zip(meta, sizes):
            loc = np.arange(h * w)
            cols.append(np.repeat(loc % w, num))
            rows.append(np.repeat(loc // w, num))
            gws.append(np.full(m, w, np.float32))
            ghs.append(np.full(m, h, np.float32))
            aw = np.asarray([anchors[2 * mi] for mi in mask], np.float32)
            ah = np.asarray(
                [anchors[2 * mi + 1] for mi in mask], np.float32
            )
            aws.append(np.tile(aw, h * w))
            ahs.append(np.tile(ah, h * w))
        col = jnp.asarray(np.concatenate(cols), jnp.float32)
        row = jnp.asarray(np.concatenate(rows), jnp.float32)
        gw = jnp.asarray(np.concatenate(gws))
        gh = jnp.asarray(np.concatenate(ghs))
        aw = jnp.asarray(np.concatenate(aws))
        ah = jnp.asarray(np.concatenate(ahs))

        sel = jnp.zeros((n, k, e), flat_heads[0].dtype)
        for fh, o, m in zip(flat_heads, offsets, sizes):
            local = topi - o
            inr = (local >= 0) & (local < m)
            g = jnp.take_along_axis(
                fh, jnp.clip(local, 0, m - 1)[..., None], axis=1
            )
            sel = jnp.where(inr[..., None], g, sel)
        csel, rsel = col[topi], row[topi]
        gwsel, ghsel = gw[topi], gh[topi]
        awsel, ahsel = aw[topi], ah[topi]

    bx = (csel + jax.nn.sigmoid(sel[..., 0])) / gwsel
    by = (rsel + jax.nn.sigmoid(sel[..., 1])) / ghsel
    bw = jnp.exp(sel[..., 2]) * awsel / net_w
    bh = jnp.exp(sel[..., 3]) * ahsel / net_h
    bsel = jnp.stack([bx, by, bw, bh], axis=-1)
    obj = jax.nn.sigmoid(sel[..., 4]) * valid
    psel = obj[..., None] * jax.nn.sigmoid(sel[..., 5 : 5 + classes])

    keep = _greedy_nms_mask(bsel, valid, k, nms_thresh)
    bsel, psel, obj = bsel, psel * keep[..., None], obj * keep
    if k < max_dets:  # pad to the requested width with suppressed slots
        pad = max_dets - k
        bsel = jnp.pad(bsel, ((0, 0), (0, pad), (0, 0)))
        psel = jnp.pad(psel, ((0, 0), (0, pad), (0, 0)))
        obj = jnp.pad(obj, ((0, 0), (0, pad)))
    return bsel, psel, obj
