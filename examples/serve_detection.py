"""Production-shaped detection serving loop.

Combines the pieces the way a deployment would: a background host thread
decodes+letterboxes images and prefetches batches to the device
(data.BatchPipeline), while the device runs the fused detection program
(forward + Pallas decode + NMS, Session.detect_on_batch) — only boxes and
scores ever return to the host.

Usage:
  python examples/serve_detection.py <list.txt> [--batch 64] [--steps 20]
where list.txt lines are image paths (detection-list format also accepted).
Without arguments, synthesizes a small image set.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np


def synth_images(n=32):
    from bcnn_tpu import bip

    os.makedirs("/tmp/bcnn_serve", exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
        p = f"/tmp/bcnn_serve/im{i}.png"
        bip.write_image(p, img)
        paths.append(p)
    lst = "/tmp/bcnn_serve/list.txt"
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p in paths)
    return lst


class _DetectionFeed:
    """Minimal loader adapter: images only (no labels), letterboxed."""

    def __init__(self, net, list_path):
        from bcnn_tpu import bip

        self.net = net
        self.bip = bip
        self.paths = [
            line.split()[0]
            for line in open(list_path)
            if line.strip()
        ]
        self.i = 0

    def next_batch(self):
        t0 = self.net.tensors[0]
        xs = np.empty((self.net.batch_size, t0.c, t0.h, t0.w), np.float32)
        for b in range(self.net.batch_size):
            p = self.paths[self.i % len(self.paths)]
            self.i += 1
            img = self.bip.load_image(p)
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            h, w, _ = img.shape
            if t0.w / w < t0.h / h:
                nw, nh = t0.w, (h * t0.w) // w
            else:
                nh, nw = t0.h, (w * t0.h) // h
            resized = self.bip.resize_bilinear(img, nw, nh)
            canvas = np.full((t0.h, t0.w, 3), 128, np.uint8)
            dx, dy = (t0.w - nw) // 2, (t0.h - nh) // 2
            self.bip.crop_image(resized, -dx, -dy, t0.w, t0.h, out=canvas)
            xs[b] = np.transpose(
                (canvas.astype(np.float32) - 127.5) / 127.5, (2, 0, 1)
            )
        return xs, np.zeros((self.net.batch_size, 1), np.float32)


def main():
    from examples._common import honor_jax_platforms
    honor_jax_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("list", nargs="?", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--thresh", type=float, default=0.5)
    args = ap.parse_args()

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.data.pipeline import BatchPipeline
    from bcnn_tpu.models import yolov3_tiny

    lst = args.list or synth_images()
    net = yolov3_tiny(
        batch_size=args.batch, width=args.size, height=args.size,
        mode=Mode.PREDICT,
    )
    import jax.numpy as jnp

    net.compute_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()

    feed = _DetectionFeed(net, lst)
    pipe = BatchPipeline(feed, depth=2).start()
    it = iter(pipe)

    # warm up / compile
    x, _ = next(it)
    sess.detect_on_batch(x, thresh=args.thresh)

    t0 = time.time()
    total_dets = 0
    for step in range(args.steps):
        x, _ = next(it)  # already device-resident (BatchPipeline)
        boxes, scores, obj = sess.detect_on_batch(x, thresh=args.thresh)
        total_dets += int((np.asarray(obj) > 0).sum())
    dt = time.time() - t0
    pipe.stop()
    n_imgs = args.steps * args.batch
    print(
        f"served {n_imgs} images in {dt:.2f}s -> {n_imgs / dt:.0f} img/s "
        f"({total_dets} detections)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
