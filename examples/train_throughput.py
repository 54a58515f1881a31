"""END-TO-END training throughput: loader + augmentation + train step.

The BENCHMARKS.md training rows time the jitted step on a constant
device batch — the right number for the step itself, but a production
run must also DECODE, LETTERBOX and AUGMENT every image. This measures
the sustained images/s of the full loop on a synthetic detection
dataset under four feed strategies:

  sync      — assemble the PNG batch on the host, then step (the
              reference's loop shape, bcnn_cl.c train loop)
  prefetch  — 1 worker assembles batch k+1 while the device runs k
              (data.BatchPipeline)
  sharded:W — W workers with (w, W)-striped loaders, round-robin
              consumption == the sequential batch order
              (data.ShardedBatchPipeline; needs >1 host core to scale)
  raw       — pre-letterboxed uint8 records (the production record
              format: decode+letterbox done once, offline); the host
              only memcpys raw pixels, and flip/contrast/brightness +
              normalization run ON DEVICE inside the jitted step
              (make_train_step(device_augment=...) — the north-star
              "bip fuses into on-device preprocessing")

Honesty notes baked into the measurement:
  - per-step wall times are recorded individually; the report includes
    the STEADY-state rate (aggregate over the last half of the run)
    because worker queues can pre-buffer enough batches to fake a short
    run's average;
  - this container's host has ONE core (nproc=1), so the host-decode
    strategies hit the 1-core PNG wall (~20 ms decode/image) no matter
    the worker count — sharded:W is correctness-tested here and sized
    for real multi-core TPU-VM hosts; raw is the feed that actually
    keeps the chip busy on a thin host.

Usage:
  python examples/train_throughput.py [--batch 64] [--steps 24]
      [--size 416] [--src-size 640] [--images 96] [--workers 8]
      [--modes sync,prefetch,sharded,raw] [--act bf16|fp32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np


# 8 visually distinct object colors; the class id IS the color (plus a
# shape bit), so a detector can generalize to unseen images — the round-4
# generator put random boxes on pure noise (no pixel evidence), which
# made held-out metrics structurally unlearnable (VERDICT r4 item 1).
_PALETTE = [
    (230, 40, 30), (40, 230, 60), (50, 80, 235), (235, 220, 40),
    (235, 50, 220), (40, 225, 225), (245, 140, 30), (240, 240, 240),
]


def write_dataset(outdir, n, src_w, src_h, seed=0, classes=8,
                  boxes_per_img=(1, 3)):
    """Synthetic LEARNABLE detection data: n PNGs + one list file.
    Dark-noise background, each labeled box drawn as a filled class-
    colored rectangle (even class) or ellipse (odd class) with a small
    brightness jitter. Two calls with different seeds give disjoint
    train/val splits of the same task."""
    from bcnn_tpu import bip

    rng = np.random.RandomState(seed)
    lst = os.path.join(outdir, f"det_n{n}_s{src_w}_seed{seed}.txt")
    if os.path.exists(lst) and len(open(lst).readlines()) == n:
        return lst  # reuse across runs (PNG encode is slow)
    yy, xx = np.mgrid[0:src_h, 0:src_w]
    lines = []
    for i in range(n):
        img = (rng.rand(src_h, src_w, 3) * 110).astype(np.uint8)
        labs = []
        for _ in range(rng.randint(boxes_per_img[0], boxes_per_img[1] + 1)):
            c = rng.randint(classes)
            cx, cy = rng.uniform(0.12, 0.88, 2)
            bw = rng.uniform(0.08, 0.3)
            bh = rng.uniform(0.08, 0.3)
            x0 = (cx - bw / 2) * src_w
            x1 = (cx + bw / 2) * src_w
            y0 = (cy - bh / 2) * src_h
            y1 = (cy + bh / 2) * src_h
            if c % 2 == 0:  # rectangle
                m = (xx >= x0) & (xx < x1) & (yy >= y0) & (yy < y1)
            else:  # ellipse inscribed in the box
                m = (
                    ((xx - cx * src_w) / max(bw * src_w / 2, 1)) ** 2
                    + ((yy - cy * src_h) / max(bh * src_h / 2, 1)) ** 2
                ) <= 1.0
            jit = rng.uniform(0.75, 1.0)
            col = np.array(_PALETTE[c % len(_PALETTE)]) * jit
            img[m] = col.astype(np.uint8)
            labs.append(
                f"{c} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}"
            )
        p = os.path.join(outdir, f"im{i}_s{src_w}_seed{seed}.png")
        bip.write_image(p, img)
        lines.append(f"{p} " + " ".join(labs))
    with open(lst, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--src-size", type=int, default=640)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--modes", default="sync,prefetch,sharded,raw")
    ap.add_argument("--act", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--outdir", default="/tmp/bcnn_tpu_det_data")
    args = ap.parse_args()
    if args.steps < 4:
        ap.error("--steps must be >= 4 (first two steps are warmup; "
                 "steady state needs at least two timed samples)")

    from examples._common import honor_jax_platforms

    honor_jax_platforms()

    import jax
    import jax.numpy as jnp

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.data import BatchPipeline, DetectionListLoader, \
        ShardedBatchPipeline
    from bcnn_tpu.models import yolov3_tiny

    os.makedirs(args.outdir, exist_ok=True)
    lst = write_dataset(args.outdir, args.images, args.src_size,
                        int(args.src_size * 0.75))

    def build():
        net = yolov3_tiny(batch_size=args.batch, width=args.size,
                          height=args.size, mode=Mode.TRAIN)
        net.compute_dtype = jnp.bfloat16
        if args.act == "bf16":
            net.train_act_dtype = jnp.bfloat16
        return net

    net = build()
    sess = Session(net, seed=0).compile_net()
    step = make_train_step(net)
    key = jax.random.PRNGKey(0)

    def run_steps(step_fn, batches):
        """Drive the donated-buffer step over a batch iterator. Returns
        per-step wall seconds (first two steps excluded: compile/fill)."""
        params, state, opt = sess.params, sess.state, sess.opt_state
        times = []
        t_prev = None
        for i, (x, y) in enumerate(batches):
            params, state, opt, loss = step_fn(
                params, state, opt, {"input": x, "label": y}, key
            )
            if i >= 1:
                # sync each step: per-step times are the whole point
                # here. block_until_ready alone returns early on the
                # axon backend — force a one-element host read.
                jax.block_until_ready(loss)
                float(np.asarray(loss))
                now = time.perf_counter()
                if t_prev is not None:
                    times.append(now - t_prev)
                t_prev = now
        sess.params, sess.state, sess.opt_state = params, state, opt
        return times

    def report(feed, times, ceiling=None):
        sustained = args.batch * len(times) / sum(times)
        # steady state = aggregate rate over the LAST HALF of the run
        # (a sum, not a median: queued feeds arrive bursty — buffered
        # batches are instant, starved ones slow — and a median would
        # cherry-pick the buffered ones)
        half = times[len(times) // 2:]
        steady = args.batch * len(half) / sum(half)
        row = {
            "feed": feed,
            "img_s": round(sustained),
            "img_s_steady": round(steady),
            "ms_per_step": round(sum(times) / len(times) * 1e3, 1),
        }
        if ceiling:
            row["efficiency_steady"] = round(steady / ceiling, 3)
        print(json.dumps(row), flush=True)
        return row

    def take(it, k):
        for _ in range(k):
            yield next(it)

    rows = []

    # pure step: constant batch, no host work — the ceiling
    rng = np.random.RandomState(0)
    xc = jnp.asarray(rng.rand(args.batch, 3, args.size, args.size),
                     jnp.float32)
    yc = jnp.zeros((args.batch, 250), jnp.float32)
    rows.append(report(
        "pure-step",
        run_steps(step, ((xc, yc) for _ in range(args.steps))),
    ))
    ceiling = rows[0]["img_s_steady"]

    modes = args.modes.split(",")
    if "sync" in modes:
        loader = DetectionListLoader(build(), lst)
        rows.append(report("sync", run_steps(
            step, (loader.next_batch() for _ in range(args.steps))
        ), ceiling))
        loader.close()

    if "prefetch" in modes:
        pipe = BatchPipeline(DetectionListLoader(build(), lst), depth=2)
        rows.append(report("prefetch", run_steps(
            step, take(iter(pipe), args.steps)
        ), ceiling))
        pipe.stop()

    if "sharded" in modes:
        pipe = ShardedBatchPipeline(
            lambda: DetectionListLoader(build(), lst),
            workers=args.workers, depth=2,
        ).start()
        # run long enough that the workers' prefill buffer (up to
        # workers*(depth+1) batches) cannot carry the steady-state half
        n_steps = max(args.steps, 4 * args.workers * 3)
        rows.append(report(f"sharded:{args.workers}", run_steps(
            step, take(iter(pipe), n_steps)
        ), ceiling))
        pipe.stop()

    if "raw" in modes:
        from bcnn_tpu.data import RawRecordLoader, records_from_loader

        rec = os.path.join(args.outdir,
                           f"train_{args.size}_n{args.images}.bcrd")
        if not os.path.exists(rec):
            # one-time offline pass: decode+letterbox into raw records
            records_from_loader(
                DetectionListLoader(build(), lst), rec, args.images
            )
        aug = {"random_fliph": 1, "min_contrast": 0.8, "max_contrast": 1.2,
               "min_brightness": -30, "max_brightness": 30}
        step_aug = make_train_step(build(), device_augment=aug)
        # host work = one uint8 memcpy per batch; augmentation + [-1,1]
        # normalization run inside the jitted step on device. The
        # prefetch overlaps the (tunnel-bound here) uint8 upload.
        pipe = BatchPipeline(RawRecordLoader(build(), rec), depth=2)
        rows.append(report("raw+device-aug", run_steps(
            step_aug, take(iter(pipe), args.steps)
        ), ceiling))
        pipe.stop()

    print("\n| feed | img/s sustained | img/s steady | ms/step "
          "| steady vs pure step |")
    print("|---|---|---|---|---|")
    for r in rows:
        eff = (f"{r['efficiency_steady']:.0%}"
               if "efficiency_steady" in r else "100%")
        print(f"| {r['feed']} | {r['img_s']} | {r['img_s_steady']} "
              f"| {r['ms_per_step']} | {eff} |")


if __name__ == "__main__":
    main()
