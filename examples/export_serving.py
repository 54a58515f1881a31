"""AOT deployment walkthrough: train/load a model, export the serving
program as a self-contained StableHLO artifact, then serve it with zero
framework code.

The reference's deploy path is its TFLite converter (for edge
interpreters); on TPU the artifact that matters is the compiled XLA
program itself — weights baked in, no graph build / config parse /
Python weight management at serve time (bcnn_tpu/deploy.py).

Usage:
  python examples/export_serving.py [--detect] [--out model.stablehlo]
Without --detect, exports the yolov3-tiny forward; with it, the full
serving pipeline (forward + decode + on-device NMS).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detect", action="store_true",
                    help="export the full detection pipeline")
    ap.add_argument("--out", default="/tmp/bcnn_model.stablehlo")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--weights", default=None,
                    help=".bcnnmodel or Darknet .weights to bake in")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS=cpu for smoke runs: the container's
    # sitecustomize pins the axon TPU plugin, env alone doesn't switch
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.deploy import load_exported
    from bcnn_tpu.models import yolov3_tiny

    net = yolov3_tiny(batch_size=args.batch, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    if args.weights:
        sess.load_weights(args.weights)

    platforms = (jax.devices()[0].platform, "cpu")
    if platforms[0] == "cpu":
        platforms = ("cpu",)
    t0 = time.time()
    sess.export_serving(
        args.out, detect=args.detect, thresh=0.5, max_dets=100,
        platforms=platforms,
    )
    print(
        f"exported {'detect pipeline' if args.detect else 'forward'} "
        f"for {platforms} -> {args.out} "
        f"({os.path.getsize(args.out)/1e6:.1f} MB, {time.time()-t0:.1f} s)"
    )

    # --- serve side: no Net/Session/config needed ---
    served = load_exported(args.out)
    x = np.random.RandomState(0).rand(args.batch, 3, 416, 416).astype(
        np.float32
    )
    t0 = time.time()
    out = served(x)
    jax.block_until_ready(out)
    print(
        f"first call (compile+run): {time.time()-t0:.1f} s; "
        f"outputs: {[tuple(np.asarray(o).shape) for o in out]}"
    )


if __name__ == "__main__":
    main()
