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


def test_topk_first_matches_decode_everything():
    """The top-k-first path (candidate selection on raw objectness LOGITS,
    decode of only the selected rows) must match the decode-everything
    path value-for-value. Selection on logits vs on sigmoid values can
    only differ on exact fp32 ties — a random-init net saturates sigmoid
    and produces those en masse (the reference's qsort tie order is
    equally unspecified there) — so drive the two paths with synthetic
    head tensors whose logits stay in the distinct, unsaturated range."""
    import jax.numpy as jnp

    from bcnn_tpu.ops.yolo import device_decode_nms, device_detect_topk
    from bcnn_tpu.ops.yolo_pallas import decode_grid_jnp

    rng = np.random.RandomState(2)
    anchors = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]
    prms = [
        dict(num=3, classes=4, anchors=anchors, mask=[3, 4, 5]),
        dict(num=3, classes=4, anchors=anchors, mask=[0, 1, 2]),
    ]
    raws = [
        jnp.asarray(rng.uniform(-4, 4, (2, 4, 4, 27)).astype(np.float32)),
        jnp.asarray(rng.uniform(-4, 4, (2, 8, 8, 27)).astype(np.float32)),
    ]

    b1, s1, o1 = device_detect_topk(
        raws, prms, 128, 128, max_dets=20, thresh=0.4
    )

    bs, os_, ps = [], [], []
    for raw, prm in zip(raws, prms):
        b, o, p = decode_grid_jnp(raw, prm, 128, 128)
        bs.append(b)
        os_.append(o)
        ps.append(p)
    b2, s2, o2 = device_decode_nms(
        jnp.concatenate(bs, 1),
        jnp.concatenate(os_, 1),
        jnp.concatenate(ps, 1),
        max_dets=20,
        thresh=0.4,
    )

    o1, o2 = np.asarray(o1), np.asarray(o2)
    assert (o1 > 0).any(), "synthetic heads produced no detections"
    np.testing.assert_allclose(o1, o2, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-6, atol=1e-7
    )
    # boxes agree on every surviving slot (suppressed slots may hold
    # different -- equally dead -- filler rows)
    alive = o1 > 0
    np.testing.assert_allclose(
        np.asarray(b1)[alive], np.asarray(b2)[alive], rtol=1e-6, atol=1e-7
    )


def test_detect_more_dets_than_candidates():
    """max_dets above the total candidate count must pad with suppressed
    slots, not crash lax.top_k (a 64x64 yolov3-tiny has only
    (2*2 + 4*4) * 3 = 60 candidates)."""
    net = yolov3_tiny(batch_size=1, width=64, height=64, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, 0).compile_net()
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    for topk in (True, False):
        b, s, o = sess.detect_on_batch(
            x, thresh=0.3, max_dets=100, topk_first=topk, use_pallas=False
        )
        assert np.asarray(b).shape == (1, 100, 4)
        assert np.asarray(o).shape == (1, 100)
        # the padded tail is dead
        assert (np.asarray(o)[0, 60:] == 0).all()


def test_topk_gather_formulations_bit_identical(monkeypatch):
    """The MXU one-hot row-select (BCNN_TOPK_GATHER=onehot, default) must
    be BIT-identical to the take_along_axis gather (=take) — the one-hot
    contraction is x*1 + 0*rest with an fp32 accumulator and the
    grid/anchor metadata is the same integer arithmetic the static tables
    encode. Checked for fp32 and bf16 heads (the serve pipeline's act16
    heads are bf16). Measured motivation: the gather/decode stage cost
    +8.0 ms of the batch-1024 int8 serve step with `take`
    (tools/serve_profile.py, BENCHMARKS.md round 5)."""
    import jax.numpy as jnp

    from bcnn_tpu.ops.yolo import device_detect_topk

    rng = np.random.RandomState(7)
    anchors = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]
    prms = [
        dict(num=3, classes=6, anchors=anchors, mask=[3, 4, 5]),
        dict(num=3, classes=6, anchors=anchors, mask=[0, 1, 2]),
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        raws = [
            jnp.asarray(rng.uniform(-4, 4, (3, 4, 4, 33)), dtype),
            jnp.asarray(rng.uniform(-4, 4, (3, 8, 8, 33)), dtype),
        ]
        outs = {}
        for mode in ("take", "onehot"):
            monkeypatch.setenv("BCNN_TOPK_GATHER", mode)
            outs[mode] = device_detect_topk(
                raws, prms, 128, 128, max_dets=16, thresh=0.3
            )
        for a, b in zip(outs["take"], outs["onehot"]):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )


def test_topk_first_edge_logits():
    """+inf objectness logits are KEPT (sigmoid=1.0, like the
    decode-everything path), and a logit whose sigmoid rounds to exactly
    the threshold is DROPPED by both paths (the threshold test runs in
    sigmoid space)."""
    import jax.numpy as jnp

    from bcnn_tpu.ops.yolo import device_decode_nms, device_detect_topk
    from bcnn_tpu.ops.yolo_pallas import decode_grid_jnp

    anchors = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]
    prm = dict(num=3, classes=2, anchors=anchors, mask=[0, 1, 2])
    raw = np.full((1, 2, 2, 21), -5.0, np.float32)
    raw[0, 0, 0, 4] = np.inf    # anchor 0 at cell (0,0): saturated obj
    raw[0, 1, 1, 4] = 1e-8      # sigmoid rounds to exactly 0.5 in fp32
    raw = jnp.asarray(raw)

    b1, s1, o1 = device_detect_topk([raw], [prm], 64, 64,
                                    max_dets=4, thresh=0.5)
    bb, oo, pp = decode_grid_jnp(raw, prm, 64, 64)
    b2, s2, o2 = device_decode_nms(bb, oo, pp, max_dets=4, thresh=0.5)

    o1, o2 = np.asarray(o1)[0], np.asarray(o2)[0]
    assert o1[0] == 1.0, o1          # +inf logit kept at objectness 1.0
    np.testing.assert_array_equal(o1, o2)
    assert (o1 > 0).sum() == 1       # the 0.5-boundary candidate dropped
