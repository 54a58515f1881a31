"""int8 detection ACCURACY through the serving path (round 5, VERDICT r4
item 2): load a trained detector checkpoint, score held-out mAP@0.5 for

  fp32            — the reference-parity PREDICT path,
  PTQ int8 x3     — absmax / percentile / KL calibration on train
                    batches (ops/quant.calibrate), end-to-end int8
                    activation flow, the SAME program bench.py's
                    12k img/s serving headline certifies,
  QAT int8        — a short fake-quant fine-tune from the checkpoint
                    (net.qat, EMA ranges), frozen via Session.freeze_qat
                    into the unchanged int8 serving path,

all on the HELD-OUT record set of the learnable synthetic detection
task (examples/train_throughput.write_dataset). Prints one JSON line.

Usage (after examples/train_soak.py produced a checkpoint):
  python tools/int8_map_study.py --ckpt /tmp/bcnn_soak_r5/ckpt_latest.npz \
      --outdir /tmp/bcnn_tpu_det_data [--batch 256] [--qat-steps 150]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np


def map50_of(detect_fn, params, state, xb, yb):
    import jax

    from bcnn_tpu.metrics_det import dets_to_rows, evaluate_detections

    bx, sc, _ = detect_fn(params, state, {"input": xb})
    bx, sc = np.asarray(bx), np.asarray(sc)
    preds, gts = [], []
    for i in range(bx.shape[0]):
        preds.append(dets_to_rows(bx[i], sc[i]))
        lab = np.asarray(yb[i]).reshape(-1, 5)
        zero = np.nonzero(lab[:, 0] == 0)[0]
        gts.append((lab[: zero[0]] if len(zero) else lab).astype(np.float64))
    res = evaluate_detections(preds, gts, 80, iou_thresholds=(0.5,))
    del jax
    return round(float(res["map50"]), 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--outdir", default="/tmp/bcnn_tpu_det_data")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--qat-steps", type=int, default=150)
    ap.add_argument("--qat-batch", type=int, default=64)
    ap.add_argument("--calib-batches", type=int, default=2)
    ap.add_argument("--calib-chunk", type=int, default=32)
    ap.add_argument("--qat-lr", type=float, default=1e-4,
                    help="fine-tune LR; the checkpoint is converged, so "
                         "default is 10x below the from-scratch 1e-3")
    ap.add_argument("--stages", default="fp32,ptq,qat",
                    help="comma subset of fp32,ptq,qat (reruns skip "
                         "recompiling finished stages)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.checkpoint import load_checkpoint
    from bcnn_tpu.compile import make_detect_fn
    from bcnn_tpu.data import RawRecordLoader
    from bcnn_tpu.models import yolov3_tiny
    from bcnn_tpu.ops.quant import calibrate, quantize_weights

    rec = os.path.join(args.outdir, f"soakl_{args.size}_n{args.images}.bcrd")
    erec = os.path.join(args.outdir, f"soakl_eval_{args.size}_n{args.batch}.bcrd")
    for p in (rec, erec):
        if not os.path.exists(p):
            raise SystemExit(f"missing record set {p} (run train_soak first)")
    params, state, _opt, _extra = load_checkpoint(args.ckpt)

    # batches: held-out eval + train calibration, normalized like training
    el = RawRecordLoader(yolov3_tiny(batch_size=args.batch, mode=Mode.VALID),
                         erec)
    xe, ye = el.next_batch()
    el.close()
    xe = jnp.asarray((xe.astype(np.float32) - 127.5) / 127.5)
    # calibration batches stay SMALL: calibrate() runs the executor
    # eagerly and keeps every watched activation alive, so a 256@416
    # batch (~8 GB of fp32 intermediates) exhausts v5e HBM — measured
    # round 5. Same image budget, chunked.
    n_cal = args.calib_batches * args.batch
    tl = RawRecordLoader(
        yolov3_tiny(batch_size=args.calib_chunk, mode=Mode.VALID), rec
    )
    calib = []
    for _ in range(n_cal // args.calib_chunk):
        xt, _yt = tl.next_batch()
        calib.append((xt.astype(np.float32) - 127.5) / 127.5)
    tl.close()

    results = {}
    stages = set(args.stages.split(","))

    # fp32 serving path (bf16 MXU compute like the bench's forward base)
    net = yolov3_tiny(batch_size=args.batch, width=args.size,
                      height=args.size, mode=Mode.PREDICT)
    net.compute_dtype = jnp.bfloat16
    detect = jax.jit(make_detect_fn(net, thresh=0.005, max_dets=100))
    if "fp32" in stages:
        results["fp32"] = map50_of(detect, params, state, xe, ye)
        print(f"fp32: {results['fp32']}", file=sys.stderr, flush=True)

    # PTQ int8 through the serving path, three calibrators
    for method in ("absmax", "percentile", "kl") if "ptq" in stages else ():
        netq = yolov3_tiny(batch_size=args.batch, width=args.size,
                           height=args.size, mode=Mode.PREDICT)
        netq.compute_dtype = jnp.bfloat16
        netq.quant = {
            "act_scales": calibrate(netq, params, state, calib,
                                    method=method),
            "weights": quantize_weights(netq, params),
        }
        detq = jax.jit(make_detect_fn(netq, thresh=0.005, max_dets=100))
        results[f"ptq_{method}"] = map50_of(detq, params, state, xe, ye)
        print(f"ptq_{method}: {results[f'ptq_{method}']}", file=sys.stderr,
              flush=True)

    # QAT: short fake-quant fine-tune from the checkpoint, then freeze
    # into the same int8 serving path
    if args.qat_steps > 0 and "qat" in stages:
        from bcnn_tpu.compile import make_train_scan

        nett = yolov3_tiny(batch_size=args.qat_batch, width=args.size,
                           height=args.size, mode=Mode.TRAIN)
        nett.set_sgd_optimizer(learning_rate=args.qat_lr, momentum=0.9)
        nett.compute_dtype = jnp.bfloat16
        nett.train_act_dtype = jnp.bfloat16
        nett.qat = True
        nett.device_augment = {"random_fliph": 1}
        sess = Session(nett, seed=0).compile_net()
        # overlay the trained checkpoint onto the QAT-initialized trees
        for k, v in params.items():
            sess.params[k] = jnp.asarray(v)
        for k, v in state.items():
            if k in sess.state:
                sess.state[k] = jnp.asarray(v)
        loader = RawRecordLoader(nett, rec)
        scan = make_train_scan(nett)
        K = 5
        p, s, o = sess.params, sess.state, sess.opt_state
        key = jax.random.PRNGKey(3)
        for d in range(max(1, args.qat_steps // K)):
            xs, ys = [], []
            for _ in range(K):
                x, y = loader.next_batch()
                xs.append(x)
                ys.append(y)
            batch = {"input": jnp.asarray(np.stack(xs)),
                     "label": jnp.asarray(np.stack(ys))}
            key, sub = jax.random.split(key)
            p, s, o, losses = scan(p, s, o, batch, sub)
        jax.block_until_ready(losses)
        loader.close()
        sess.params, sess.state, sess.opt_state = p, s, o
        quant = sess.freeze_qat()
        netf = yolov3_tiny(batch_size=args.batch, width=args.size,
                           height=args.size, mode=Mode.PREDICT)
        netf.compute_dtype = jnp.bfloat16
        netf.quant = quant
        detf = jax.jit(make_detect_fn(netf, thresh=0.005, max_dets=100))
        pf = {k: np.asarray(v) for k, v in p.items()}
        sf = {k: np.asarray(v) for k, v in s.items()
              if not k.startswith("qat_")}
        # fp32 eval of the fine-tuned weights: separates "the fine-tune
        # damaged the model" from "the freeze/int8 path damaged it"
        results["qat_fp32"] = map50_of(detect, pf, sf, xe, ye)
        print(f"qat_fp32: {results['qat_fp32']}", file=sys.stderr,
              flush=True)
        results["qat_int8"] = map50_of(detf, pf, sf, xe, ye)
        print(f"qat_int8: {results['qat_int8']}", file=sys.stderr,
              flush=True)

    out = {
        "study": "int8_detection_map50_held_out",
        "eval_images": int(args.batch),
        "ckpt": args.ckpt,
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
