"""Stage-attribution profile of the int8 serving pipeline's post-
processing tail.

The serve headline (BENCH_MODE=serve) times forward + top-k-first decode
+ device NMS; at batch 1024 the pipeline runs ~12 ms behind the bare
int8 forward (79.5 vs 67.5 ms, BENCHMARKS.md) — ~15% of the step, no
longer the "free" post-processing it was at batch 256 (0.8 ms). This
tool compiles FOUR cumulative programs over ONE net/params build and
times each with the bench protocol, so consecutive deltas attribute the
tail to its stages:

  fwd    forward only (head-tensor checksums stay on device)
  topk   + objectness concat, sigmoid threshold, lax.top_k
  decode + per-head row gather + box/class decode math
  full   + greedy-NMS mask (make_detect_fn — the shipped program)

Usage:  python tools/serve_profile.py            # batch 1024, 416
        BENCH_BATCH=256 python tools/serve_profile.py

One TPU job at a time (CLAUDE.md); 4 fresh HLOs = several minutes of
remote compile before the first timed run.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _measure, _sync  # same timing protocol as the headline


def build(batch, size):
    from bcnn_tpu import Mode, Session
    from bcnn_tpu.compile import execute, make_detect_fn
    from bcnn_tpu.models import yolov3_tiny
    from bcnn_tpu.ops.quant import ptq_synthetic
    from bcnn_tpu.types import LayerType

    net = yolov3_tiny(batch_size=batch, width=size, height=size,
                      mode=Mode.PREDICT)
    net.compute_dtype = jnp.bfloat16
    net.act_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    ptq_synthetic(net, sess)
    params, state = sess.params, sess.state

    yolo_nodes = [
        (n.src[0], dict(n.param)) for n in net.nodes
        if n.type == LayerType.YOLOV3
    ]
    net_w, net_h = net.tensors[0].w, net.tensors[0].h
    thresh, max_dets = 0.5, 100

    def fwd_raws(params, state, x):
        ex = execute(net, params, state, {"input": x}, Mode.PREDICT, None)
        return [ex.values[src] for src, _ in yolo_nodes]

    @jax.jit
    def p_fwd(params, state, x):
        raws = fwd_raws(params, state, x)
        return tuple(jnp.sum(r, dtype=jnp.float32) for r in raws)

    @jax.jit
    def p_topk(params, state, x):
        raws = fwd_raws(params, state, x)
        n = raws[0].shape[0]
        e = 5 + yolo_nodes[0][1]["classes"]
        flat = [r.reshape(n, -1, e) for r in raws]
        objl = jnp.concatenate([f[..., 4] for f in flat], axis=1)
        masked = jnp.where(jax.nn.sigmoid(objl) > thresh, objl, -jnp.inf)
        topv, topi = jax.lax.top_k(masked, max_dets)
        return jnp.sum(jnp.where(jnp.isfinite(topv), topv, 0.0),
                       dtype=jnp.float32), jnp.sum(topi)

    # decode-no-NMS: device_detect_topk with the greedy mask replaced by
    # the validity mask (same gathers + decode math, no fori_loop)
    from bcnn_tpu.ops import yolo as yolo_ops

    def _decode_tail(raws, return_valid=False):
        # the top-k + gather + decode tail of device_detect_topk, minus
        # _greedy_nms_mask — same math as ops/yolo.py:586 so stage deltas
        # attribute to real stages of the shipped program
        n = raws[0].shape[0]
        prm = [p for _, p in yolo_nodes]
        e = 5 + prm[0]["classes"]
        classes = prm[0]["classes"]
        cols, rows, gws, ghs, aws, ahs = [], [], [], [], [], []
        flat_heads, offsets, sizes = [], [], []
        off = 0
        for raw, p in zip(raws, prm):
            _, h, w, _ = raw.shape
            num = p["num"]
            anchors, mask = p["anchors"], p["mask"]
            loc = np.arange(h * w)
            cols.append(np.repeat(loc % w, num))
            rows.append(np.repeat(loc // w, num))
            gws.append(np.full(h * w * num, w, np.float32))
            ghs.append(np.full(h * w * num, h, np.float32))
            aw = np.asarray([anchors[2 * m] for m in mask], np.float32)
            ah = np.asarray([anchors[2 * m + 1] for m in mask], np.float32)
            aws.append(np.tile(aw, h * w))
            ahs.append(np.tile(ah, h * w))
            flat_heads.append(raw.reshape(n, h * w * num, e))
            offsets.append(off)
            sizes.append(h * w * num)
            off += h * w * num
        col = jnp.asarray(np.concatenate(cols), jnp.float32)
        row = jnp.asarray(np.concatenate(rows), jnp.float32)
        gw = jnp.asarray(np.concatenate(gws))
        gh = jnp.asarray(np.concatenate(ghs))
        aw = jnp.asarray(np.concatenate(aws))
        ah = jnp.asarray(np.concatenate(ahs))
        objl = jnp.concatenate([fh[..., 4] for fh in flat_heads], axis=1)
        masked = jnp.where(jax.nn.sigmoid(objl) > thresh, objl, -jnp.inf)
        k = min(max_dets, masked.shape[1])
        topv_l, topi = jax.lax.top_k(masked, k)
        valid = topv_l > -jnp.inf
        sel = jnp.zeros((n, k, e), flat_heads[0].dtype)
        for fh, o, m in zip(flat_heads, offsets, sizes):
            local = topi - o
            inr = (local >= 0) & (local < m)
            g = jnp.take_along_axis(
                fh, jnp.clip(local, 0, m - 1)[..., None], axis=1
            )
            sel = jnp.where(inr[..., None], g, sel)
        csel, rsel = col[topi], row[topi]
        bx = (csel + jax.nn.sigmoid(sel[..., 0])) / gw[topi]
        by = (rsel + jax.nn.sigmoid(sel[..., 1])) / gh[topi]
        bw = jnp.exp(sel[..., 2]) * aw[topi] / net_w
        bh = jnp.exp(sel[..., 3]) * ah[topi] / net_h
        bsel = jnp.stack([bx, by, bw, bh], axis=-1)
        obj = jax.nn.sigmoid(sel[..., 4]) * valid
        psel = obj[..., None] * jax.nn.sigmoid(sel[..., 5 : 5 + classes])
        if return_valid:
            return bsel, psel, obj, valid
        return bsel, psel, obj

    @jax.jit
    def p_decode(params, state, x):
        raws = fwd_raws(params, state, x)
        b, p, o = _decode_tail(raws)
        return (jnp.sum(b, dtype=jnp.float32),
                jnp.sum(p, dtype=jnp.float32),
                jnp.sum(o, dtype=jnp.float32))

    detect = make_detect_fn(net, thresh=thresh, max_dets=max_dets)

    @jax.jit
    def p_full(params, state, x):
        b, p, o = detect(params, state, {"input": x})
        return (jnp.sum(b, dtype=jnp.float32),
                jnp.sum(p, dtype=jnp.float32),
                jnp.sum(o, dtype=jnp.float32))

    # full pipeline with the greedy-NMS scan UNROLLED (plain Python loop
    # instead of fori_loop): identical math, but XLA can fuse the K tiny
    # mask updates into a few kernels instead of paying per-iteration
    # loop overhead. ~5*K extra HLO ops (K=100) — well under the
    # scan-length ceiling that wedges the remote compiler.
    def detect_unrolled(raws):
        bsel, psel_raw, obj, valid = _decode_tail(raws, return_valid=True)
        x, y, w, h = (bsel[..., 0], bsel[..., 1], bsel[..., 2],
                      bsel[..., 3])
        iou = yolo_ops._box_iou(
            (x[..., :, None], y[..., :, None],
             w[..., :, None], h[..., :, None]),
            (x[..., None, :], y[..., None, :],
             w[..., None, :], h[..., None, :]),
        )
        k = bsel.shape[1]
        suppress_pair = iou > yolo_ops.NMS_THRESH
        upper = np.triu(np.ones((k, k), bool), 1)  # j > i, static
        alive = valid
        for i in range(k):
            row = suppress_pair[:, i, :] & alive[:, i][:, None] & upper[i]
            alive = alive & ~row
        keep = alive & valid
        return bsel, psel_raw * keep[..., None], obj * keep

    @jax.jit
    def p_full_unroll(params, state, x):
        raws = fwd_raws(params, state, x)
        b, p, o = detect_unrolled(raws)
        return (jnp.sum(b, dtype=jnp.float32),
                jnp.sum(p, dtype=jnp.float32),
                jnp.sum(o, dtype=jnp.float32))

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, 3, size, size), jnp.float32
    )
    return {
        "fwd": lambda: p_fwd(params, state, x),
        "topk": lambda: p_topk(params, state, x),
        "decode": lambda: p_decode(params, state, x),
        "full": lambda: p_full(params, state, x),
        "full_unroll": lambda: p_full_unroll(params, state, x),
    }


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    size = int(os.environ.get("BENCH_SIZE", "416"))
    runs = int(os.environ.get("BENCH_RUNS", "16"))
    stages = os.environ.get(
        "STAGES", "fwd,topk,decode,full,full_unroll"
    ).split(",")
    progs = build(batch, size)
    out = {"batch": batch, "size": size}
    prev = None
    for name in stages:
        fn = progs[name]
        _sync(fn())  # compile + warmup
        best, med, _ = _measure(fn, runs)
        out[name] = {
            "best_ms": round(best * 1e3, 2),
            "median_best_ms": round(med * 1e3, 2),
            "img_s": round(batch / best, 1),
        }
        if prev is not None:
            out[name]["delta_best_ms"] = round((best - prev) * 1e3, 2)
        prev = best
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
