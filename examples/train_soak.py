"""Sustained training soak: the whole-run number, not the burst number.

BENCHMARKS.md's training rows are best-of-burst over ~20 dispatches —
the right *comparative* protocol on a shared jittery chip, but a
production run (the reference's actual operating mode,
/root/reference/src/cli/bcnn_cl.c:104-146: loop batches, print loss,
periodically eval + write checkpoints) lives in steady state. This
script runs that mode for thousands of steps and reports what nobody
can extrapolate from a burst:

  - whole-run wall-clock img/s (EVERYTHING included: compile, staging,
    eval cadence, checkpoint cadence, resume overhead),
  - per-dispatch step-time percentiles over the full run (thermal /
    shared-chip window drift shows up here, not in a 20-call best),
  - device-memory stability across thousands of scan dispatches,
  - a mid-run kill + `--resume` (checkpoints are written atomically, so
    a SIGKILL at any instant leaves a loadable state).

Loop shape = the production feed the repo converged on (BENCHMARKS.md):
raw uint8 records (decode+letterbox done once, offline) staged K
batches at a time into ONE `lax.scan` device program with on-device
augmentation + normalization (compile.make_train_scan(device_augment)).
Host work per dispatch is a memcpy; upload is uint8 (4x smaller than
fp32). A one-deep software pipeline overlaps staging/upload of dispatch
k+1 with device compute of dispatch k: the scan is dispatched async and
only dispatch k-1's losses are synced each iteration.

`--feed resident` switches to the device-resident dataset
(make_train_scan_resident): the record set is uploaded to HBM once and
dispatches carry only a (K, B) int32 index slab — the feed that holds
sustained == burst on a tunneled chip (BENCHMARKS.md "Sustained
training soak"; the streamed feed is upload-bound there). Checkpoints
are feed-agnostic: a stream segment can resume as a resident one.

Usage (the BENCHMARKS.md run):
  python examples/train_soak.py --steps 5000 --batch 256 --scan 5 \
      --dir /tmp/bcnn_soak                 # segment 1 (kill it mid-run)
  python examples/train_soak.py --steps 5000 --batch 256 --scan 5 \
      --dir /tmp/bcnn_soak --resume --feed resident   # finishes
  python examples/train_soak.py --dir /tmp/bcnn_soak --report
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np


def log_event(path, ev, **kw):
    kw["ev"] = ev
    kw["t"] = time.time()
    with open(path, "a") as f:
        f.write(json.dumps(kw) + "\n")


def atomic_checkpoint(path, params, state, opt_state, extra):
    """A kill can land mid-write; write-to-temp + rename keeps the latest
    checkpoint always loadable (POSIX rename is atomic)."""
    from bcnn_tpu.checkpoint import save_checkpoint

    tmp = path + ".tmp.npz"
    save_checkpoint(tmp, params, state, opt_state, extra=extra)
    # save_checkpoint appends .npz itself only if missing; normalize
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def device_mem():
    """bytes_in_use / peak if the backend exposes them (CPU and some
    plugins do not — the soak then reports mem as unavailable)."""
    import jax

    try:
        st = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return None
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    out = {k: int(st[k]) for k in keys if k in st}
    return out or None


def build_net(args, mode):
    import jax.numpy as jnp

    from bcnn_tpu import Mode
    from bcnn_tpu.models import yolov3_tiny

    net = yolov3_tiny(batch_size=args.batch, width=args.size,
                      height=args.size, mode=Mode.TRAIN if mode == "train"
                      else Mode.VALID)
    net.compute_dtype = jnp.bfloat16
    if args.act == "bf16":
        net.train_act_dtype = jnp.bfloat16
        net.act_dtype = jnp.bfloat16
    return net


def make_records(args):
    """Synthetic detection data -> raw records, train + held-out eval.
    Offline decode+letterbox pass, reused across runs/segments."""
    from bcnn_tpu.data import records_from_loader
    from bcnn_tpu.data.loaders import DetectionListLoader
    from train_throughput import write_dataset

    os.makedirs(args.outdir, exist_ok=True)
    # "soakl": the learnable-objects generator (round 5) — class-colored
    # shapes under the boxes, so held-out detection metrics can move;
    # the old "soak_" records (noise + uncorrelated boxes) are stale
    rec = os.path.join(args.outdir, f"soakl_{args.size}_n{args.images}.bcrd")
    erec = os.path.join(args.outdir, f"soakl_eval_{args.size}_n{args.batch}.bcrd")
    if not os.path.exists(rec):
        lst = write_dataset(args.outdir, args.images, args.src_size,
                            int(args.src_size * 0.75))
        records_from_loader(
            DetectionListLoader(build_net(args, "valid"), lst), rec,
            args.images)
    if not os.path.exists(erec):
        # separate subdir: write_dataset keys its reuse check on (n, src
        # size) only, and the eval set must not alias the train images
        edir = os.path.join(args.outdir, "eval")
        os.makedirs(edir, exist_ok=True)
        elst = write_dataset(edir, args.batch, args.src_size,
                             int(args.src_size * 0.75), seed=999)
        records_from_loader(
            DetectionListLoader(build_net(args, "valid"), elst), erec,
            args.batch)
    return rec, erec


def _map50(boxes, scores, labels):
    """mAP@0.5 of one detect-pipeline batch against record labels
    ((B, 50*5) normalized [x,y,w,h,class], first x==0 terminates)."""
    from bcnn_tpu.metrics_det import dets_to_rows, evaluate_detections

    preds, gts = [], []
    for i in range(boxes.shape[0]):
        preds.append(dets_to_rows(boxes[i], scores[i]))
        lab = np.asarray(labels[i]).reshape(-1, 5)
        zero = np.nonzero(lab[:, 0] == 0)[0]
        gts.append((lab[: zero[0]] if len(zero) else lab).astype(
            np.float64))
    res = evaluate_detections(preds, gts, 80, iou_thresholds=(0.5,))
    return float(res["map50"])


def run(args):
    from examples._common import honor_jax_platforms

    honor_jax_platforms()

    import jax
    import jax.numpy as jnp

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.checkpoint import load_checkpoint
    from bcnn_tpu.compile import execute, get_loss, make_train_scan
    from bcnn_tpu.data import RawRecordLoader

    os.makedirs(args.dir, exist_ok=True)
    logp = os.path.join(args.dir, "soak_log.jsonl")
    ckpt = os.path.join(args.dir, "ckpt_latest.npz")
    if args.pidfile:
        with open(args.pidfile, "w") as f:
            f.write(str(os.getpid()))

    rec, erec = make_records(args)
    aug = {"random_fliph": 1, "min_contrast": 0.8, "max_contrast": 1.2,
           "min_brightness": -30, "max_brightness": 30}
    if args.rotation:
        # box-aware device rotation: Paeth three-shear, Pallas row-shift
        # kernel on TPU (BENCHMARKS.md round-5 shear section)
        aug["rotation_range"] = float(args.rotation)
    net = build_net(args, "train")
    net.device_augment = aug
    sess = Session(net, seed=0).compile_net()
    params, state, opt = sess.params, sess.state, sess.opt_state

    loader = RawRecordLoader(net, rec)
    key = jax.random.PRNGKey(args.seed)
    start_step = 0  # in scan dispatches
    resume_pos = None
    if args.resume:
        if not os.path.exists(ckpt):
            raise SystemExit(f"--resume: no checkpoint at {ckpt}")
        params, state, opt, extra = load_checkpoint(ckpt)
        start_step = int(extra["dispatch"])
        key = jnp.asarray(np.asarray(extra["rng"], np.uint32))
        resume_pos = int(extra["loader_pos"])

    eval_step = None  # compiled lazily at the first eval point (timed)
    eval_batch = None
    detect_fn = None  # compiled lazily at the first --eval-map point
    map_batches = None

    K, B = args.scan, args.batch
    C, H, W = 3, args.size, args.size
    n_disp = args.steps // K
    log_event(logp, "seg", start=start_step, target=n_disp,
              batch=B, scan=K, resume=bool(args.resume),
              act=args.act, feed=args.feed, pid=os.getpid())

    if args.feed == "resident":
        # dataset lives in HBM; per-dispatch host traffic = (K, B) int32.
        # Positions are absolute sample counters in BOTH feeds, so a
        # cross-feed resume continues training exactly (params/opt/rng),
        # just not the same sample ORDER (resident shuffles per epoch).
        from bcnn_tpu.compile import make_train_scan_resident
        from bcnn_tpu.data import EpochIndexStream

        xa, ya = loader.read_all()
        dataset = jax.device_put(
            {"input": jnp.asarray(xa), "label": jnp.asarray(ya)}
        )
        stream = EpochIndexStream(loader.n, B, seed=args.seed)
        if resume_pos is not None:
            stream.pos = resume_pos
        rscan = make_train_scan_resident(net)

        def stage():
            return jnp.asarray(stream.next(K))

        def dispatch(params, state, opt, staged, sub):
            return rscan(params, state, opt, dataset, staged, sub)

        def get_pos():
            return stream.pos
    else:
        if resume_pos is not None:
            loader._set_pos(resume_pos)
        scan = make_train_scan(net)
        xs_host = np.empty((K, B, C, H, W), np.uint8)
        ys_host = np.empty((K, B, loader.label_size), np.float32)

        def stage():
            for j in range(K):
                x, y = loader.next_batch()
                xs_host[j] = x
                ys_host[j] = y
            return jax.device_put(
                {"input": jnp.asarray(xs_host),
                 "label": jnp.asarray(ys_host)}
            )

        def dispatch(params, state, opt, staged, sub):
            return scan(params, state, opt, staged, sub)

        def get_pos():
            return loader._get_pos()

    pending = None  # (dispatch index, losses handle)
    t_sync_prev = None
    i = start_step
    first = True
    t_loop0 = time.perf_counter()
    while i < n_disp:
        batch = stage()
        key, sub = jax.random.split(key)
        params, state, opt, losses = dispatch(params, state, opt, batch,
                                              sub)
        i += 1
        if pending is not None:
            pi, pl = pending
            lv = np.asarray(pl)  # full sync: forces the host read
            now = time.perf_counter()
            if t_sync_prev is not None:
                log_event(logp, "d", i=pi, dt=round(now - t_sync_prev, 5),
                          loss=round(float(lv.mean()), 3))
            t_sync_prev = now
        pending = (i, losses)
        if first:
            # dispatch 0 carries the (server-side) compile; sync it alone
            np.asarray(pending[1])
            t0 = time.perf_counter()
            log_event(logp, "compile", i=i, sec=round(t0 - t_loop0, 1))
            t_sync_prev = t0
            pending = None
            first = False
            m = device_mem()
            if m:
                log_event(logp, "mem", i=i, **m)

        if i % args.mem_every == 0:
            m = device_mem()
            if m:
                log_event(logp, "mem", i=i, **m)
        if args.eval_every and i % args.eval_every == 0:
            # drain the pipeline so eval timing doesn't eat a train tail
            if pending is not None:
                np.asarray(pending[1])
                t_sync_prev = time.perf_counter()
                log_event(logp, "d", i=pending[0], dt=None, loss=None)
                pending = None
            te = time.perf_counter()
            if eval_step is None:
                # held-out loss in TRAIN mode WITHOUT an update: the yolo
                # cost exists only in TRAIN mode, in the reference too
                # (bcnn_yolo.c:250 returns before the delta pass outside
                # BCNN_MODE_TRAIN) — VALID loss would read 0.0 forever
                @jax.jit
                def eval_step(p, s, b):
                    ex = execute(net, p, s, b, Mode.TRAIN,
                                 jax.random.PRNGKey(0))
                    return get_loss(ex)

                el = RawRecordLoader(net, erec)
                xe, ye = el.next_batch()
                el.close()
                eval_batch = jax.device_put({
                    "input": jnp.asarray(
                        (xe.astype(np.float32) - 127.5) / 127.5),
                    "label": jnp.asarray(ye),
                })
            ev = float(np.asarray(eval_step(params, state, eval_batch)))
            log_event(logp, "eval", i=i, loss=round(ev, 3),
                      sec=round(time.perf_counter() - te, 3))
            t_sync_prev = time.perf_counter()
        if args.eval_map and i % args.eval_map == 0:
            if pending is not None:
                np.asarray(pending[1])
                log_event(logp, "d", i=pending[0], dt=None, loss=None)
                pending = None
            tm = time.perf_counter()
            if detect_fn is None:
                from bcnn_tpu.compile import make_detect_fn

                # make_detect_fn executes in PREDICT internally, so the
                # TRAIN net can be reused; one extra HLO, compiled once
                detect_fn = jax.jit(
                    make_detect_fn(net, thresh=0.005, max_dets=100)
                )
                map_batches = {}
                for tag, path in (("val", erec), ("train", rec)):
                    ml = RawRecordLoader(net, path)
                    xm, ym = ml.next_batch()
                    ml.close()
                    map_batches[tag] = (
                        jax.device_put({"input": jnp.asarray(
                            (xm.astype(np.float32) - 127.5) / 127.5)}),
                        ym,
                    )
            ent = {}
            for tag, (mb, ym) in map_batches.items():
                bx, sc, _o = detect_fn(params, state, mb)
                ent[tag] = round(_map50(np.asarray(bx), np.asarray(sc),
                                        ym), 4)
            log_event(logp, "eval_map", i=i, map50_val=ent["val"],
                      map50_train=ent["train"],
                      sec=round(time.perf_counter() - tm, 3))
            t_sync_prev = time.perf_counter()
        if args.ckpt_every and i % args.ckpt_every == 0:
            if pending is not None:
                np.asarray(pending[1])
                log_event(logp, "d", i=pending[0], dt=None, loss=None)
                pending = None
            tc = time.perf_counter()
            atomic_checkpoint(ckpt, params, state, opt, extra={
                "dispatch": int(i),
                "rng": np.asarray(key).tolist(),
                "loader_pos": int(get_pos()),
            })
            log_event(logp, "ckpt", i=i,
                      sec=round(time.perf_counter() - tc, 3))
            t_sync_prev = time.perf_counter()

    if pending is not None:
        lv = np.asarray(pending[1])
        now = time.perf_counter()
        if t_sync_prev is not None:
            log_event(logp, "d", i=pending[0], dt=round(now - t_sync_prev, 5),
                      loss=round(float(lv.mean()), 3))
    m = device_mem()
    if m:
        log_event(logp, "mem", i=i, **m)
    atomic_checkpoint(ckpt, params, state, opt, extra={
        "dispatch": int(i), "rng": np.asarray(key).tolist(),
        "loader_pos": int(get_pos()),
    })
    log_event(logp, "seg_end", i=i)
    print(json.dumps(report(args)))


def report(args):
    """Aggregate soak_log.jsonl across ALL segments (a killed segment has
    no seg_end; its wall time runs to its last logged event)."""
    logp = os.path.join(args.dir, "soak_log.jsonl")
    segs, cur = [], None
    events = [json.loads(ln) for ln in open(logp) if ln.strip()]
    for e in events:
        if e["ev"] == "seg":
            if cur:
                segs.append(cur)
            cur = {"t0": e["t"], "t1": e["t"], "start": e["start"],
                   "batch": e["batch"], "scan": e["scan"], "d": [],
                   "compile_s": 0.0, "eval": [], "ckpt": [], "mem": [],
                   "last": e["start"], "feed": e.get("feed", "stream")}
            continue
        if cur is None:
            continue
        cur["t1"] = e["t"]
        if e["ev"] == "d":
            cur["last"] = max(cur["last"], e["i"])
            if e.get("dt") is not None:
                cur["d"].append(e["dt"])
        elif e["ev"] == "eval":
            cur["eval"].append(e)
        elif e["ev"] == "eval_map":
            cur.setdefault("eval_map", []).append(e)
        elif e["ev"] == "ckpt":
            cur["ckpt"].append(e["sec"])
        elif e["ev"] == "mem":
            cur["mem"].append(e)
        elif e["ev"] == "seg_end":
            cur["last"] = max(cur["last"], e["i"])
    if cur:
        segs.append(cur)
    if not segs:
        raise SystemExit("no segments logged")
    batch, scan = segs[0]["batch"], segs[0]["scan"]
    wall = sum(s["t1"] - s["t0"] for s in segs)
    # useful progress = the final segment's last dispatch: work done
    # between the last checkpoint and a kill is REDONE by --resume, and
    # the whole-run rate must not count it twice (its wall time counts)
    steps = segs[-1]["last"] * scan
    lost = sum(max(0, a["last"] - b["start"])
               for a, b in zip(segs, segs[1:])) * scan
    dts = np.asarray(sum((s["d"] for s in segs), []))
    mems = sum((s["mem"] for s in segs), [])
    evals = sum((s["eval"] for s in segs), [])
    maps = sum((s.get("eval_map", []) for s in segs), [])
    per_step = dts / scan * 1e3
    out = {
        "steps": int(steps),
        "steps_redone_after_kill": int(lost),
        "batch": batch,
        "scan": scan,
        "segments": len(segs),
        "compile_s": [round(e["sec"], 1) for e in events
                      if e["ev"] == "compile" and "sec" in e],
        "wall_s": round(wall, 1),
        "img_s_whole_run": round(steps * batch / wall, 1) if wall else None,
        "img_s_steady": int(round(float(
            batch * scan * len(dts) / dts.sum()))) if len(dts) else None,
        "step_ms_p50": round(float(np.percentile(per_step, 50)), 1)
        if len(dts) else None,
        "step_ms_p90": round(float(np.percentile(per_step, 90)), 1)
        if len(dts) else None,
        "step_ms_p99": round(float(np.percentile(per_step, 99)), 1)
        if len(dts) else None,
        "step_ms_max": round(float(per_step.max()), 1)
        if len(dts) else None,
        "eval_n": len(evals),
        "eval_first_last_loss": [evals[0]["loss"], evals[-1]["loss"]]
        if evals else None,
        # the generalization trajectory (held-out mAP over training):
        # [dispatch, val, train] triples, thinned to <= 20 points
        "map50_trajectory": [
            [e["i"], e["map50_val"], e["map50_train"]]
            for e in maps[:: max(1, len(maps) // 20)]
        ] if maps else None,
        "map50_val_last": maps[-1]["map50_val"] if maps else None,
        "map50_train_last": maps[-1]["map50_train"] if maps else None,
        "ckpt_n": sum(len(s["ckpt"]) for s in segs),
        "ckpt_s_mean": round(float(np.mean(sum((s["ckpt"] for s in segs),
                                               []) or [0])), 2),
        # one entry per segment: a soak that survives kills/feed changes
        # is a sequence of regimes; the aggregate alone hides which
        # regime a bottleneck (or a fix) belongs to
        "per_segment": [
            {
                "feed": s["feed"],
                "dispatch_range": [s["start"], s["last"]],
                "wall_s": round(s["t1"] - s["t0"], 1),
                "d_n": len(s["d"]),
                "step_ms_p50": round(float(np.percentile(
                    np.asarray(s["d"]) / scan * 1e3, 50)), 1)
                if s["d"] else None,
                "step_ms_p90": round(float(np.percentile(
                    np.asarray(s["d"]) / scan * 1e3, 90)), 1)
                if s["d"] else None,
                "img_s_steady": int(round(
                    batch * scan * len(s["d"]) / sum(s["d"])))
                if s["d"] else None,
            }
            for s in segs
        ],
    }
    if mems:
        inuse = [m.get("bytes_in_use") for m in mems
                 if m.get("bytes_in_use") is not None]
        if inuse:
            out["mem_gb_first"] = round(inuse[0] / 2**30, 2)
            out["mem_gb_last"] = round(inuse[-1] / 2**30, 2)
            out["mem_gb_max"] = round(max(inuse) / 2**30, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000,
                    help="total optimizer steps across all segments")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=5)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--src-size", type=int, default=640)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--act", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--feed", default="stream",
                    choices=["stream", "resident"],
                    help="stream: stage uint8 batches per dispatch; "
                    "resident: dataset uploaded to HBM once, dispatches "
                    "send (K,B) int32 indices only")
    ap.add_argument("--eval-every", type=int, default=50,
                    help="eval cadence, in scan dispatches (0 = off)")
    ap.add_argument("--eval-map", type=int, default=0,
                    help="held-out mAP cadence, in scan dispatches "
                    "(0 = off): runs the detect pipeline on one batch "
                    "of the HELD-OUT record set and one batch of the "
                    "train set, logging map50_val / map50_train")
    ap.add_argument("--ckpt-every", type=int, default=100,
                    help="checkpoint cadence, in scan dispatches (0 = off)")
    ap.add_argument("--mem-every", type=int, default=50)
    ap.add_argument("--dir", default="/tmp/bcnn_soak")
    ap.add_argument("--outdir", default="/tmp/bcnn_tpu_det_data")
    ap.add_argument("--rotation", type=float, default=0.0,
                    help="rotation_range (deg, full width) for the device "
                         "augment; 0 = off (the historical soak config)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--report", action="store_true",
                    help="aggregate the log and print the summary only")
    ap.add_argument("--pidfile", default="")
    args = ap.parse_args()
    if args.scan > 10:
        ap.error("--scan must be <= 10 (shared-compiler HLO-size rule)")
    if args.report:
        print(json.dumps(report(args), indent=1))
        return
    run(args)


if __name__ == "__main__":
    main()
